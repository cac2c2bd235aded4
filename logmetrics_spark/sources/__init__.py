from .synth import SynthSpec, gen_pages_pdf, gen_pages_spark, write_pages_parquet  # noqa: F401
from .tableio import TableIO  # noqa: F401
