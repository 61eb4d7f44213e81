"""flac_codec_tpu — TPU-native FLAC (RFC 9639) codec framework.

Architecture (see SURVEY.md §7):
  * Host plane: bitstream/metadata/CRC/MD5 + C++ native engine (this package's
    ``bitio``, ``crc``, ``metadata``, ``native`` modules).
  * Device plane: batched JAX/Pallas kernels in ``ops`` operating on
    ``(batch, channels, block_size)`` frames.
  * Orchestration: ``parallel`` shards frame batches over a
    ``jax.sharding.Mesh``; ``encode``/``decode`` expose the reference's
    reader/writer API surface (reference: src/decode.rs, src/encode.rs).
"""

from . import errors  # noqa: F401
from .errors import FlacError  # noqa: F401

__version__ = "0.1.0"


def __getattr__(name):
    # Lazy exports to keep import light (JAX only loads when ops are used).
    import importlib

    api = {
        "FlacByteReader": ".decode",
        "FlacSampleReader": ".decode",
        "FlacChannelReader": ".decode",
        "FlacStreamReader": ".decode",
        "verify": ".decode",
        "FlacByteWriter": ".encode",
        "FlacSampleWriter": ".encode",
        "FlacChannelWriter": ".encode",
        "FlacStreamWriter": ".encode",
        "Options": ".encode",
        "generate_seektable": ".encode",
        "BlockList": ".metadata",
        "Streaminfo": ".metadata",
    }
    if name in api:
        mod = importlib.import_module(api[name], __name__)
        return getattr(mod, name)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
