"""Pure-Python, spec-level codecs (media + compression).

Like ``sources/avro_py.py``, these are clean-room implementations of
PUBLIC format specifications — no third-party codec libraries (none
are available in this container), no reference code. The media codecs
(bmp/png/wav) give the multimodal operators a REAL decode step: binary
column in, typed pixels/samples out, all inside Arrow-batched
``mapInPandas`` loops. ``snappy`` implements the snappy block format
so the Avro container's snappy codec works without the spark-avro jar.
"""

from datafusion_streams_spark.codecs.bmp import decode_bmp, encode_bmp

__all__ = ["decode_bmp", "encode_bmp"]
