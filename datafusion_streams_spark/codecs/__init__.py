"""Pure-Python, spec-level media codecs.

Like ``sources/avro_py.py``, these are clean-room implementations of
PUBLIC file-format specifications — no third-party codec libraries
(none are available in this container), no reference code. They give
the multimodal operators a REAL decode step: binary column in, typed
pixels out, all inside Arrow-batched ``mapInPandas`` loops.
"""

from datafusion_streams_spark.codecs.bmp import decode_bmp, encode_bmp

__all__ = ["decode_bmp", "encode_bmp"]
