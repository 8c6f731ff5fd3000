"""Import-only stubs: the parity test never runs real coding through the
reference (the rebuild has its own C++ rANS in dcae_tpu/native)."""


class BufferedRansEncoder:
    def __init__(self, *a, **k):
        raise NotImplementedError("stub: real coding not available")


class RansDecoder:
    def __init__(self, *a, **k):
        raise NotImplementedError("stub: real coding not available")
