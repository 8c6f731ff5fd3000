"""PyTorch reference-checkpoint converter.

Maps the reference's flat state_dict (released lambda-checkpoints,
/root/reference/README.md:78-85; module naming from
/root/reference/models/dcae.py:541-614) onto this framework's NHWC Flax
parameter tree, applying the layout transforms validated in
tests/test_blocks.py:

  Linear  (out,in)        -> (in,out)             transpose
  Conv2d  (out,in,kh,kw)  -> (kh,kw,in,out)       HWIO
  ConvT2d (in,out,kh,kw)  -> (kh,kw,in,out)       + spatial flip
  LayerNorm weight/bias   -> scale/bias
  stacked Swin pairs      -> reference blocks 2p (W) / 2p+1 (SW) stacked on
                             a leading scan axis

Entropy-coding buffers (_quantized_cdf/_offset/_cdf_length, scale_table,
and EB medians) map into CodecTables rather than params — tables are host
state here. The converter is torch-free: it consumes a {name: np.ndarray}
dict (use `load_torch_state_dict` to read a .pth with torch installed).
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import numpy as np


# ----------------------------------------------------------------- loading --

def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Read a torch checkpoint into {name: ndarray}, unwrapping the
    reference's {'state_dict': ...} container and DDP 'module.' prefixes."""
    import torch

    blob = torch.load(path, map_location="cpu", weights_only=False)
    sd = blob.get("state_dict", blob) if isinstance(blob, dict) else blob
    out = {}
    for k, v in sd.items():
        name = k[len("module."):] if k.startswith("module.") else k
        if hasattr(v, "numpy"):
            out[name] = v.detach().cpu().numpy()
    return out


# -------------------------------------------------------------- transforms --

def t_linear(w: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(w.T)


def t_conv(w: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(w.transpose(2, 3, 1, 0))


def t_deconv(w: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(w[:, :, ::-1, ::-1].transpose(2, 3, 0, 1))


def _set(tree: Dict, path: Tuple[str, ...], value: np.ndarray) -> None:
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


class _Mapper:
    def __init__(self, src: Dict[str, np.ndarray]):
        self.src = src
        self.out: Dict = {}
        self.used: set = set()

    def take(self, key: str) -> np.ndarray:
        self.used.add(key)
        return self.src[key]

    def linear(self, src: str, dst: Tuple[str, ...]) -> None:
        # layers.Dense wraps nn.Dense under a "dense" scope
        _set(self.out, dst + ("dense", "kernel"),
             t_linear(self.take(src + ".weight")))
        if src + ".bias" in self.src:
            _set(self.out, dst + ("dense", "bias"),
                 self.take(src + ".bias"))

    def conv(self, src: str, dst: Tuple[str, ...]) -> None:
        _set(self.out, dst + ("conv", "kernel"),
             t_conv(self.take(src + ".weight")))
        if src + ".bias" in self.src:
            _set(self.out, dst + ("conv", "bias"), self.take(src + ".bias"))

    def deconv(self, src: str, dst: Tuple[str, ...]) -> None:
        _set(self.out, dst + ("kernel",), t_deconv(self.take(src + ".weight")))
        if src + ".bias" in self.src:
            _set(self.out, dst + ("bias",), self.take(src + ".bias"))

    def ln(self, src: str, dst: Tuple[str, ...]) -> None:
        _set(self.out, dst + ("ln", "scale"), self.take(src + ".weight"))
        _set(self.out, dst + ("ln", "bias"), self.take(src + ".bias"))

    def scale(self, src: str, dst: Tuple[str, ...]) -> None:
        _set(self.out, dst + ("scale",), self.take(src + ".scale"))

    def raw(self, src: str, dst: Tuple[str, ...]) -> None:
        _set(self.out, dst, self.take(src))

    # ----- composite reference modules -----

    def rbb(self, src: str, dst: Tuple[str, ...]) -> None:
        """ResidualBottleneckBlock: conv1/conv2/conv3 [+ skip]."""
        for c in ("conv1", "conv2", "conv3"):
            self.conv(f"{src}.{c}", dst + (c,))
        if f"{src}.skip.weight" in self.src:
            self.conv(f"{src}.skip", dst + ("skip",))

    def rbb_stride(self, src: str, dst: Tuple[str, ...]) -> None:
        self.conv(f"{src}.conv", dst + ("down",))
        for i in (1, 2, 3):
            self.rbb(f"{src}.res{i}", dst + (f"res{i}",))

    def rbb_upsample(self, src: str, dst: Tuple[str, ...]) -> None:
        for i in (1, 2, 3):
            self.rbb(f"{src}.res{i}", dst + (f"res{i}",))
        self.deconv(f"{src}.conv", dst + ("up",))

    def wmsa(self, src: str, dst: Tuple[str, ...]) -> None:
        # WMSA holds raw (in, out) kernels (shared by einsum + Pallas paths)
        _set(self.out, dst + ("qkv_kernel",),
             t_linear(self.take(f"{src}.embedding_layer.weight")))
        _set(self.out, dst + ("qkv_bias",),
             self.take(f"{src}.embedding_layer.bias"))
        _set(self.out, dst + ("proj_kernel",),
             t_linear(self.take(f"{src}.linear.weight")))
        _set(self.out, dst + ("proj_bias",), self.take(f"{src}.linear.bias"))
        self.raw(f"{src}.relative_position_params",
                 dst + ("relative_position",))

    def conv_glu(self, src: str, dst: Tuple[str, ...]) -> None:
        self.linear(f"{src}.fc1", dst + ("fc1",))
        self.linear(f"{src}.fc2", dst + ("fc2",))
        self.conv(f"{src}.dwconv.dwconv", dst + ("dwconv", "dw"))

    def swin_block(self, src: str, dst: Tuple[str, ...]) -> None:
        """ResScaleConvolutionGateBlock."""
        self.ln(f"{src}.ln1", dst + ("ln1",))
        self.ln(f"{src}.ln2", dst + ("ln2",))
        self.wmsa(f"{src}.msa", dst + ("msa",))
        self.conv_glu(f"{src}.mlp", dst + ("mlp",))
        self.scale(f"{src}.res_scale_1", dst + ("res_scale_1",))
        self.scale(f"{src}.res_scale_2", dst + ("res_scale_2",))

    def swin_stack(self, src: str, dst: Tuple[str, ...],
                   block_num: int) -> None:
        """SwinBlockWithConvMulti -> SwinStack (scanned pairs when deep)."""
        if block_num >= 4 and block_num % 2 == 0:
            # convert each block, then stack pairs on a leading axis
            pairs: List[Dict] = []
            for p in range(block_num // 2):
                sub = _Mapper(self.src)
                sub.used = self.used
                sub.swin_block(f"{src}.layers.{2 * p}", ("w",))
                sub.swin_block(f"{src}.layers.{2 * p + 1}", ("sw",))
                pairs.append(sub.out)
            stacked = _stack_trees(pairs)
            _set_tree(self.out, dst + ("pairs",), stacked)
        else:
            for i in range(block_num):
                self.swin_block(f"{src}.layers.{i}", dst + (f"block{i}",))
        self.conv(f"{src}.conv", dst + ("conv",))

    def conv_with_dw(self, src: str, dst: Tuple[str, ...]) -> None:
        self.conv(f"{src}.in_trans", dst + ("in_trans",))
        self.conv(f"{src}.dw_conv", dst + ("dw_conv",))
        self.conv(f"{src}.out_trans", dst + ("out_trans",))

    def msa_aggregation(self, src: str, dst: Tuple[str, ...]) -> None:
        """MultiScaleAggregation: s, dense(3 ConvWithDW + proj), spatial."""
        self.conv(f"{src}.s", dst + ("s",))
        for j in range(3):
            # reference wraps each in Sequential(GELU, ConvWithDW) -> index 1
            self.conv_with_dw(f"{src}.dense.conv_layers.{j}.1",
                              dst + ("dense", f"layer{j}"))
        self.conv(f"{src}.dense.proj", dst + ("dense", "proj"))
        self.conv(f"{src}.spatial_atte.conv1", dst + ("spatial", "conv"))

    def dict_attention(self, src: str, dst: Tuple[str, ...]) -> None:
        self.linear(f"{src}.x_trans", dst + ("x_trans",))
        self.ln(f"{src}.ln_scale", dst + ("ln_scale",))
        self.msa_aggregation(f"{src}.msa", dst + ("msa",))
        self.ln(f"{src}.lnx", dst + ("lnx",))
        self.linear(f"{src}.q_trans", dst + ("q_trans",))
        self.ln(f"{src}.dict_ln", dst + ("dict_ln",))
        self.linear(f"{src}.k", dst + ("k",))
        self.linear(f"{src}.linear", dst + ("linear",))
        self.ln(f"{src}.ln_mlp", dst + ("ln_mlp",))
        self.conv_glu(f"{src}.mlp", dst + ("mlp",))
        self.linear(f"{src}.output_trans.0", dst + ("output_trans",))
        self.raw(f"{src}.scale", dst + ("scale",))
        for i in (1, 2, 3):
            self.scale(f"{src}.res_scale_{i}", dst + (f"res_scale_{i}",))

    def slice_net(self, src: str, dst: Tuple[str, ...]) -> None:
        for j, idx in enumerate((0, 2, 4)):  # Sequential conv indices
            self.conv(f"{src}.{idx}", dst + (f"conv{j}",))


def _stack_trees(trees: List[Dict]) -> Dict:
    out = {}
    for k in trees[0]:
        vals = [t[k] for t in trees]
        if isinstance(vals[0], dict):
            out[k] = _stack_trees(vals)
        else:
            out[k] = np.stack(vals)
    return out


def _set_tree(tree: Dict, path: Tuple[str, ...], sub: Dict) -> None:
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = sub


# ------------------------------------------------------------ entry points --

def convert_reference_state_dict(sd: Dict[str, np.ndarray], cfg
                                 ) -> Dict:
    """Reference flat state_dict -> Flax param tree (numpy leaves)."""
    # dcae_7-style split checkpoints carry compress_model./decompress_model.
    # prefixes with duplicated shared modules; collapse to the flat layout.
    if any(k.startswith("compress_model.") for k in sd):
        flat = {}
        for k, v in sd.items():
            if k.startswith("compress_model."):
                flat[k[len("compress_model."):]] = v
            elif k.startswith("decompress_model."):
                name = k[len("decompress_model."):]
                flat.setdefault(name, v)  # shared: compress side wins
            else:
                flat[k] = v
        sd = flat

    m = _Mapper(sd)

    # g_a: Sequential [RBBS, Swin, RBBS, Swin, RBBS, Swin, conv]
    m.rbb_stride("g_a.0", ("g_a", "down0"))
    m.swin_stack("g_a.1", ("g_a", "swin1"), cfg.block_num[0])
    m.rbb_stride("g_a.2", ("g_a", "down1"))
    m.swin_stack("g_a.3", ("g_a", "swin2"), cfg.block_num[1])
    m.rbb_stride("g_a.4", ("g_a", "down2"))
    m.swin_stack("g_a.5", ("g_a", "swin3"), cfg.block_num[2])
    m.conv("g_a.6", ("g_a", "down3"))

    # g_s: [deconv, Swin, RBBUp, Swin, RBBUp, Swin, RBBUp]
    m.deconv("g_s.0", ("g_s", "up0"))
    m.swin_stack("g_s.1", ("g_s", "swin1"), cfg.block_num[2])
    m.rbb_upsample("g_s.2", ("g_s", "up1"))
    m.swin_stack("g_s.3", ("g_s", "swin2"), cfg.block_num[1])
    m.rbb_upsample("g_s.4", ("g_s", "up2"))
    m.swin_stack("g_s.5", ("g_s", "swin3"), cfg.block_num[0])
    m.rbb_upsample("g_s.6", ("g_s", "up3"))

    # h_a: [RBBS, Swin, conv]
    m.rbb_stride("h_a.0", ("h_a", "down0"))
    m.swin_stack("h_a.1", ("h_a", "swin"), 1)
    m.conv("h_a.2", ("h_a", "down1"))

    # h_z_s1 / h_z_s2: [deconv, Swin, RBBUp]
    for name in ("h_z_s1", "h_z_s2"):
        m.deconv(f"{name}.0", (name, "up0"))
        m.swin_stack(f"{name}.1", (name, "swin"), 1)
        m.rbb_upsample(f"{name}.2", (name, "up1"))

    m.raw("dt", ("dt",))
    for i in range(cfg.num_slices):
        m.dict_attention(f"dt_cross_attention.{i}",
                         (f"dt_cross_attention_{i}",))
        m.slice_net(f"cc_mean_transforms.{i}", (f"cc_mean_transforms_{i}",))
        m.slice_net(f"cc_scale_transforms.{i}",
                    (f"cc_scale_transforms_{i}",))
        m.slice_net(f"lrp_transforms.{i}", (f"lrp_transforms_{i}",))

    # entropy bottleneck filters + quantiles
    n_filters = len(cfg.eb_filters)
    for i in range(n_filters + 1):
        m.raw(f"entropy_bottleneck._matrix{i}",
              ("entropy_bottleneck", f"matrix_{i}"))
        m.raw(f"entropy_bottleneck._bias{i}",
              ("entropy_bottleneck", f"bias_{i}"))
        if i < n_filters:
            m.raw(f"entropy_bottleneck._factor{i}",
                  ("entropy_bottleneck", f"factor_{i}"))
    m.raw("entropy_bottleneck.quantiles", ("entropy_bottleneck", "quantiles"))

    return m.out


def convert_checkpoint(path: str, cfg) -> Dict:
    """Load + convert a reference .pth checkpoint to a Flax param tree."""
    return convert_reference_state_dict(load_torch_state_dict(path), cfg)


def export_reference_state_dict(params: Dict, cfg) -> Dict[str, np.ndarray]:
    """Inverse of convert_reference_state_dict: emit a torch-layout flat
    state dict from a Flax param tree (so reference-code users can load
    checkpoints trained here). convert(export(p)) == p exactly — tested."""
    out: Dict[str, np.ndarray] = {}

    def inv_linear(w):
        return np.ascontiguousarray(np.asarray(w).T)

    def inv_conv(w):
        return np.ascontiguousarray(np.asarray(w).transpose(3, 2, 0, 1))

    def inv_deconv(w):
        return np.ascontiguousarray(
            np.asarray(w).transpose(2, 3, 0, 1)[:, :, ::-1, ::-1])

    def get(tree, path):
        node = tree
        for p in path:
            node = node[p]
        return np.asarray(node)

    def linear(dst, src_path):
        out[f"{dst}.weight"] = inv_linear(get(params, src_path + ("kernel",)))
        out[f"{dst}.bias"] = get(params, src_path + ("bias",))

    def conv(dst, src_path):
        out[f"{dst}.weight"] = inv_conv(
            get(params, src_path + ("conv", "kernel")))
        node = get_tree(params, src_path + ("conv",))
        if "bias" in node:
            out[f"{dst}.bias"] = get(params, src_path + ("conv", "bias"))

    def get_tree(tree, path):
        node = tree
        for p in path:
            node = node[p]
        return node

    def deconv(dst, src_path):
        out[f"{dst}.weight"] = inv_deconv(
            get(params, src_path + ("kernel",)))
        node = get_tree(params, src_path)
        if "bias" in node:
            out[f"{dst}.bias"] = get(params, src_path + ("bias",))

    def ln(dst, src_path):
        out[f"{dst}.weight"] = get(params, src_path + ("ln", "scale"))
        out[f"{dst}.bias"] = get(params, src_path + ("ln", "bias"))

    def scale(dst, src_path):
        out[f"{dst}.scale"] = get(params, src_path + ("scale",))

    def rbb(dst, src_path):
        for c in ("conv1", "conv2", "conv3"):
            conv(f"{dst}.{c}", src_path + (c,))
        if "skip" in get_tree(params, src_path):
            conv(f"{dst}.skip", src_path + ("skip",))

    def rbb_stride(dst, src_path):
        conv(f"{dst}.conv", src_path + ("down",))
        for i in (1, 2, 3):
            rbb(f"{dst}.res{i}", src_path + (f"res{i}",))

    def rbb_upsample(dst, src_path):
        for i in (1, 2, 3):
            rbb(f"{dst}.res{i}", src_path + (f"res{i}",))
        deconv(f"{dst}.conv", src_path + ("up",))

    def wmsa(dst, src_path):
        out[f"{dst}.embedding_layer.weight"] = inv_linear(
            get(params, src_path + ("qkv_kernel",)))
        out[f"{dst}.embedding_layer.bias"] = get(
            params, src_path + ("qkv_bias",))
        out[f"{dst}.linear.weight"] = inv_linear(
            get(params, src_path + ("proj_kernel",)))
        out[f"{dst}.linear.bias"] = get(params, src_path + ("proj_bias",))
        out[f"{dst}.relative_position_params"] = get(
            params, src_path + ("relative_position",))

    def conv_glu(dst, src_path):
        linear(f"{dst}.fc1", src_path + ("fc1", "dense"))
        linear(f"{dst}.fc2", src_path + ("fc2", "dense"))
        conv(f"{dst}.dwconv.dwconv", src_path + ("dwconv", "dw"))

    def swin_block(dst, src_path):
        ln(f"{dst}.ln1", src_path + ("ln1",))
        ln(f"{dst}.ln2", src_path + ("ln2",))
        wmsa(f"{dst}.msa", src_path + ("msa",))
        conv_glu(f"{dst}.mlp", src_path + ("mlp",))
        scale(f"{dst}.res_scale_1", src_path + ("res_scale_1",))
        scale(f"{dst}.res_scale_2", src_path + ("res_scale_2",))

    def swin_stack(dst, src_path, block_num):
        if block_num >= 4 and block_num % 2 == 0:
            stacked = get_tree(params, src_path + ("pairs",))
            for p_idx in range(block_num // 2):
                sub = jax_slice_tree(stacked, p_idx)
                for half, li in (("w", 2 * p_idx), ("sw", 2 * p_idx + 1)):
                    tmp = {f"{k}": v for k, v in sub[half].items()}
                    # temporarily splice into params under a scratch key
                    _export_block_from_tree(
                        tmp, f"{dst}.layers.{li}", out)
        else:
            for i in range(block_num):
                swin_block(f"{dst}.layers.{i}", src_path + (f"block{i}",))
        conv(f"{dst}.conv", src_path + ("conv",))

    def _export_block_from_tree(tree, dst, out_dict):
        """swin_block but reading from a detached (unstacked) subtree."""
        out_dict[f"{dst}.ln1.weight"] = np.asarray(tree["ln1"]["ln"]["scale"])
        out_dict[f"{dst}.ln1.bias"] = np.asarray(tree["ln1"]["ln"]["bias"])
        out_dict[f"{dst}.ln2.weight"] = np.asarray(tree["ln2"]["ln"]["scale"])
        out_dict[f"{dst}.ln2.bias"] = np.asarray(tree["ln2"]["ln"]["bias"])
        msa = tree["msa"]
        out_dict[f"{dst}.msa.embedding_layer.weight"] = inv_linear(
            msa["qkv_kernel"])
        out_dict[f"{dst}.msa.embedding_layer.bias"] = np.asarray(
            msa["qkv_bias"])
        out_dict[f"{dst}.msa.linear.weight"] = inv_linear(msa["proj_kernel"])
        out_dict[f"{dst}.msa.linear.bias"] = np.asarray(msa["proj_bias"])
        out_dict[f"{dst}.msa.relative_position_params"] = np.asarray(
            msa["relative_position"])
        mlp = tree["mlp"]
        out_dict[f"{dst}.mlp.fc1.weight"] = inv_linear(
            mlp["fc1"]["dense"]["kernel"])
        out_dict[f"{dst}.mlp.fc1.bias"] = np.asarray(
            mlp["fc1"]["dense"]["bias"])
        out_dict[f"{dst}.mlp.fc2.weight"] = inv_linear(
            mlp["fc2"]["dense"]["kernel"])
        out_dict[f"{dst}.mlp.fc2.bias"] = np.asarray(
            mlp["fc2"]["dense"]["bias"])
        out_dict[f"{dst}.mlp.dwconv.dwconv.weight"] = inv_conv(
            mlp["dwconv"]["dw"]["conv"]["kernel"])
        out_dict[f"{dst}.mlp.dwconv.dwconv.bias"] = np.asarray(
            mlp["dwconv"]["dw"]["conv"]["bias"])
        out_dict[f"{dst}.res_scale_1.scale"] = np.asarray(
            tree["res_scale_1"]["scale"])
        out_dict[f"{dst}.res_scale_2.scale"] = np.asarray(
            tree["res_scale_2"]["scale"])

    def jax_slice_tree(tree, idx):
        import jax

        return jax.tree.map(lambda x: np.asarray(x)[idx], tree)

    def conv_with_dw(dst, src_path):
        conv(f"{dst}.in_trans", src_path + ("in_trans",))
        conv(f"{dst}.dw_conv", src_path + ("dw_conv",))
        conv(f"{dst}.out_trans", src_path + ("out_trans",))

    def msa_aggregation(dst, src_path):
        conv(f"{dst}.s", src_path + ("s",))
        for j in range(3):
            conv_with_dw(f"{dst}.dense.conv_layers.{j}.1",
                         src_path + ("dense", f"layer{j}"))
        conv(f"{dst}.dense.proj", src_path + ("dense", "proj"))
        conv(f"{dst}.spatial_atte.conv1", src_path + ("spatial", "conv"))

    def dict_attention(dst, src_path):
        linear(f"{dst}.x_trans", src_path + ("x_trans", "dense"))
        ln(f"{dst}.ln_scale", src_path + ("ln_scale",))
        msa_aggregation(f"{dst}.msa", src_path + ("msa",))
        ln(f"{dst}.lnx", src_path + ("lnx",))
        linear(f"{dst}.q_trans", src_path + ("q_trans", "dense"))
        ln(f"{dst}.dict_ln", src_path + ("dict_ln",))
        linear(f"{dst}.k", src_path + ("k", "dense"))
        linear(f"{dst}.linear", src_path + ("linear", "dense"))
        ln(f"{dst}.ln_mlp", src_path + ("ln_mlp",))
        conv_glu(f"{dst}.mlp", src_path + ("mlp",))
        linear(f"{dst}.output_trans.0", src_path + ("output_trans", "dense"))
        out[f"{dst}.scale"] = get(params, src_path + ("scale",))
        for i in (1, 2, 3):
            scale(f"{dst}.res_scale_{i}", src_path + (f"res_scale_{i}",))

    def slice_net(dst, src_path):
        for j, idx in enumerate((0, 2, 4)):
            conv(f"{dst}.{idx}", src_path + (f"conv{j}",))

    # ---- walk (mirror of convert_reference_state_dict) ----
    rbb_stride("g_a.0", ("g_a", "down0"))
    swin_stack("g_a.1", ("g_a", "swin1"), cfg.block_num[0])
    rbb_stride("g_a.2", ("g_a", "down1"))
    swin_stack("g_a.3", ("g_a", "swin2"), cfg.block_num[1])
    rbb_stride("g_a.4", ("g_a", "down2"))
    swin_stack("g_a.5", ("g_a", "swin3"), cfg.block_num[2])
    conv("g_a.6", ("g_a", "down3"))

    deconv("g_s.0", ("g_s", "up0"))
    swin_stack("g_s.1", ("g_s", "swin1"), cfg.block_num[2])
    rbb_upsample("g_s.2", ("g_s", "up1"))
    swin_stack("g_s.3", ("g_s", "swin2"), cfg.block_num[1])
    rbb_upsample("g_s.4", ("g_s", "up2"))
    swin_stack("g_s.5", ("g_s", "swin3"), cfg.block_num[0])
    rbb_upsample("g_s.6", ("g_s", "up3"))

    rbb_stride("h_a.0", ("h_a", "down0"))
    swin_stack("h_a.1", ("h_a", "swin"), 1)
    conv("h_a.2", ("h_a", "down1"))
    for name in ("h_z_s1", "h_z_s2"):
        deconv(f"{name}.0", (name, "up0"))
        swin_stack(f"{name}.1", (name, "swin"), 1)
        rbb_upsample(f"{name}.2", (name, "up1"))

    out["dt"] = get(params, ("dt",))
    for i in range(cfg.num_slices):
        dict_attention(f"dt_cross_attention.{i}",
                       (f"dt_cross_attention_{i}",))
        slice_net(f"cc_mean_transforms.{i}", (f"cc_mean_transforms_{i}",))
        slice_net(f"cc_scale_transforms.{i}", (f"cc_scale_transforms_{i}",))
        slice_net(f"lrp_transforms.{i}", (f"lrp_transforms_{i}",))

    n_filters = len(cfg.eb_filters)
    for i in range(n_filters + 1):
        out[f"entropy_bottleneck._matrix{i}"] = get(
            params, ("entropy_bottleneck", f"matrix_{i}"))
        out[f"entropy_bottleneck._bias{i}"] = get(
            params, ("entropy_bottleneck", f"bias_{i}"))
        if i < n_filters:
            out[f"entropy_bottleneck._factor{i}"] = get(
                params, ("entropy_bottleneck", f"factor_{i}"))
    out["entropy_bottleneck.quantiles"] = get(
        params, ("entropy_bottleneck", "quantiles"))
    return out


def validate_converted(params: Dict, template: Dict) -> List[str]:
    """Compare a converted tree against an initialized template; returns a
    list of mismatch descriptions (empty = structurally identical)."""
    import jax

    problems = []

    def walk(p, a, b):
        if isinstance(b, dict):
            if not isinstance(a, dict):
                problems.append(f"{p}: missing subtree")
                return
            for k in b:
                if k not in a:
                    problems.append(f"{p}/{k}: missing")
                else:
                    walk(f"{p}/{k}", a[k], b[k])
            for k in a:
                if k not in b:
                    problems.append(f"{p}/{k}: unexpected")
        else:
            if np.asarray(a).shape != np.asarray(b).shape:
                problems.append(
                    f"{p}: shape {np.asarray(a).shape} != "
                    f"{np.asarray(b).shape}")

    walk("", params, jax.tree.map(np.asarray, template))
    return problems
