"""Entropy-model tests: likelihood math, index building, aux-loss routing,
and — the real correctness bar — end-to-end rANS round-trips through tables
built from the models (SURVEY.md §4: a broken entropy path shows up
immediately as a failed round-trip)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from scipy.special import erfc

from dcae_tpu.entropy import gaussian, ops, rans, tables
from dcae_tpu.entropy.bottleneck import EntropyBottleneck


def np_standard_cdf(x):
    return 0.5 * erfc(-(2 ** -0.5) * x)


class TestGaussianConditional:
    def test_likelihood_closed_form(self, rng):
        y = rng.normal(0, 3, (2, 4, 4, 8)).astype(np.float32)
        mu = rng.normal(0, 1, y.shape).astype(np.float32)
        sigma = rng.uniform(0.05, 5, y.shape).astype(np.float32)
        got = np.asarray(gaussian.likelihood(jnp.array(y), jnp.array(sigma),
                                             jnp.array(mu)))
        s = np.maximum(sigma, 0.11)
        v = np.abs(y - mu)
        want = np_standard_cdf((0.5 - v) / s) - np_standard_cdf((-0.5 - v) / s)
        want = np.maximum(want, 1e-9)
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-7)

    def test_build_indexes_matches_loop_semantics(self, rng):
        """Reference semantics: start at levels-1, subtract 1 for every
        non-final table entry >= sigma (/root/reference usage of the
        conditional's build_indexes)."""
        table = gaussian.get_scale_table()
        scales = rng.uniform(0.0, 300.0, (1000,)).astype(np.float32)
        got = np.asarray(gaussian.build_indexes(jnp.array(scales), table))
        bounded = np.maximum(scales, 0.11)
        want = np.full(scales.shape, len(table) - 1, np.int64)
        for s in table[:-1]:
            want -= (bounded <= s).astype(np.int64)
        np.testing.assert_array_equal(got, want)

    def test_scale_table_endpoints(self):
        t = gaussian.get_scale_table()
        assert len(t) == 64
        assert abs(t[0] - 0.11) < 1e-6
        assert abs(t[-1] - 256.0) < 1e-3

    def test_training_noise_vs_eval_round(self, rng):
        y = jnp.array(rng.normal(0, 2, (1, 4, 4, 4)).astype(np.float32))
        sigma = jnp.ones_like(y)
        mu = jnp.zeros_like(y)
        v_train, _ = gaussian.apply(y, sigma, mu, training=True,
                                    rng=jax.random.PRNGKey(0))
        v_eval, _ = gaussian.apply(y, sigma, mu, training=False)
        assert np.all(np.abs(np.asarray(v_train - y)) <= 0.5)
        np.testing.assert_allclose(np.asarray(v_eval), np.round(np.asarray(y)),
                                   atol=1e-6)

    def test_lower_bound_gradient(self):
        g = jax.grad(lambda x: ops.lower_bound(x, 0.11))
        assert g(0.5) == 1.0       # above bound: pass through
        assert g(0.05) == 0.0      # below bound, grad pushes down: blocked
        g2 = jax.grad(lambda x: -ops.lower_bound(x, 0.11))
        assert g2(0.05) == -1.0    # below bound, grad pushes up: pass


class TestEntropyBottleneck:
    @pytest.fixture
    def eb(self):
        model = EntropyBottleneck(channels=8)
        params = model.init(jax.random.PRNGKey(0),
                            jnp.zeros((1, 4, 4, 8)))["params"]
        return model, params

    def test_forward_shapes_and_bounds(self, eb, rng):
        model, params = eb
        z = jnp.array(rng.normal(0, 5, (2, 4, 4, 8)).astype(np.float32))
        values, like = model.apply({"params": params}, z)
        assert values.shape == z.shape and like.shape == z.shape
        assert np.all(np.asarray(like) > 0) and np.all(np.asarray(like) <= 1)

    def test_eval_rounds_around_medians(self, eb, rng):
        model, params = eb
        z = jnp.array(rng.normal(0, 5, (1, 4, 4, 8)).astype(np.float32))
        values, _ = model.apply({"params": params}, z)
        med = np.asarray(params["quantiles"])[:, 0, 1]
        want = np.round(np.asarray(z) - med) + med
        np.testing.assert_allclose(np.asarray(values), want, atol=1e-5)

    def test_aux_loss_grads_only_quantiles(self, eb):
        model, params = eb
        grads = jax.grad(
            lambda p: model.apply({"params": p}, method=model.aux_loss))(
                params)
        assert np.any(np.asarray(grads["quantiles"]) != 0)
        for k, g in grads.items():
            if k != "quantiles":
                assert not np.any(np.asarray(g) != 0), k

    def test_aux_loss_decreases_under_sgd(self, eb):
        model, params = eb
        loss_fn = lambda p: model.apply({"params": p}, method=model.aux_loss)
        l0 = float(loss_fn(params))
        step = jax.jit(lambda p: jax.tree.map(
            lambda a, b: a - 1e-2 * b, p, jax.grad(loss_fn)(p)))
        p = params
        for _ in range(50):
            p = step(p)
        assert float(loss_fn(p)) < l0

    def test_noise_likelihood_trainable(self, eb, rng):
        """RD-style gradient must reach the filter-chain parameters."""
        model, params = eb
        z = jnp.array(rng.normal(0, 5, (1, 4, 4, 8)).astype(np.float32))

        def bpp(p):
            _, like = model.apply({"params": p}, z, training=True,
                                  rngs={"noise": jax.random.PRNGKey(1)})
            return -jnp.log2(like).sum()

        grads = jax.grad(bpp)(params)
        assert np.any(np.asarray(grads["matrix_0"]) != 0)


class TestCodingRoundTrips:
    def test_gaussian_real_coding(self, rng):
        """Encode N(mu, sigma) symbols through baked tables, decode exactly,
        and land near the analytic bit-rate."""
        table = gaussian.get_scale_table()
        bank = tables.build_gaussian_table(table)
        n = 20_000
        sigma = rng.uniform(0.2, 8.0, n).astype(np.float32)
        mu = rng.normal(0, 1, n).astype(np.float32)
        y = (mu + sigma * rng.normal(0, 1, n)).astype(np.float32)

        indexes = np.asarray(gaussian.build_indexes(jnp.array(sigma), table))
        symbols = np.round(y - mu).astype(np.int32)
        stream = rans.encode_with_indexes(
            symbols, indexes, bank.quantized_cdf, bank.cdf_length, bank.offset)
        decoded = rans.decode_with_indexes(
            stream, indexes, bank.quantized_cdf, bank.cdf_length, bank.offset)
        np.testing.assert_array_equal(decoded, symbols)

        like = np.asarray(gaussian.likelihood(
            jnp.array(symbols.astype(np.float32) + mu), jnp.array(sigma),
            jnp.array(mu)))
        analytic_bits = -np.log2(like).sum()
        actual_bits = len(stream) * 8
        assert actual_bits < analytic_bits * 1.05 + 128

    def test_factorized_real_coding(self, rng):
        model = EntropyBottleneck(channels=8)
        params = model.init(jax.random.PRNGKey(0),
                            jnp.zeros((1, 4, 4, 8)))["params"]
        bank = tables.build_factorized_table(
            jax.tree.map(np.asarray, dict(params)))
        medians = np.asarray(params["quantiles"])[:, 0, 1]

        z = rng.normal(0, 4, (2, 6, 6, 8)).astype(np.float32)
        symbols = np.round(z - medians).astype(np.int32)     # NHWC
        indexes = np.broadcast_to(np.arange(8, dtype=np.int32), z.shape)
        stream = rans.encode_with_indexes(
            symbols.reshape(-1), indexes.reshape(-1),
            bank.quantized_cdf, bank.cdf_length, bank.offset)
        decoded = rans.decode_with_indexes(
            stream, indexes.reshape(-1),
            bank.quantized_cdf, bank.cdf_length, bank.offset)
        np.testing.assert_array_equal(decoded, symbols.reshape(-1))

    def test_codec_tables_save_load_round_trip(self, tmp_path):
        model = EntropyBottleneck(channels=4)
        params = model.init(jax.random.PRNGKey(0),
                            jnp.zeros((1, 2, 2, 4)))["params"]
        ct = tables.build_codec_tables(jax.tree.map(np.asarray, dict(params)))
        path = str(tmp_path / "tables.npz")
        ct.save(path)
        loaded = tables.CodecTables.load(path)
        np.testing.assert_array_equal(ct.gaussian.quantized_cdf,
                                      loaded.gaussian.quantized_cdf)
        np.testing.assert_array_equal(ct.factorized.offset,
                                      loaded.factorized.offset)
        np.testing.assert_array_equal(ct.medians, loaded.medians)
