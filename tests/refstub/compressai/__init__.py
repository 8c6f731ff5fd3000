"""Minimal torch compressai stub — just enough surface to import and run
the *reference's own* model code (/root/reference/models/dcae.py) forward
on CPU for parity testing against the Flax rebuild.

Only the math needed by DCAE.forward is implemented (EntropyBottleneck
filter-chain likelihood, GaussianConditional erfc likelihood, conv3x3,
CompressionModel base). The rANS classes are import-only stubs: real
coding is not exercised through this stub.
"""
