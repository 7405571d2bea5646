"""webcodec — a PySpark-native per-column lightweight-compression engine.

Built from scratch (NOT a port) with the capabilities of the reference
columnar storage engine (see SURVEY.md): per-column adaptive encoding
(dictionary, RLE/bit-pack hybrid, delta family, frame-of-reference,
byte-stream-split, FSST, plain) -> page building with statistics ->
block compression -> file assembly with footers, plus the read path
(footer -> page pruning via min/max -> decode).

All encode/decode kernels are vectorized numpy/Arrow — no per-row
Python in the hot path. Spark integration is Arrow-batch based
(``mapInArrow`` / Python DataSource), so Catalyst keeps planning the
relational parts and the encode engine is a leaf.

Reference parity map: SURVEY.md §2 tables A–G (citations to
parquet-java 1.16 classes appear in each kernel's docstring).
"""

__version__ = "0.2.0"

from webcodec.config import EncoderConfig  # noqa: F401
from webcodec.filefmt import read_table, write_table  # noqa: F401
