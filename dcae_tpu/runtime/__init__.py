"""Bitstream container (L3) and transport/serving (L6)."""

from dcae_tpu.runtime import container, service
from dcae_tpu.runtime.container import (calculate_padding, pack_bin,
                                        read_bin, save_bin, unpack_bin)
from dcae_tpu.runtime.service import BitstreamServer, send_bytes, send_file

__all__ = ["container", "service", "pack_bin", "unpack_bin", "save_bin",
           "read_bin", "calculate_padding", "BitstreamServer", "send_bytes",
           "send_file"]
