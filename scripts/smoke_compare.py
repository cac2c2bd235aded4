"""Dev smoke: engine vs oracle routed-row equality on small synth data."""

import sys
import collections

import numpy as np

from logmetrics_spark.config import load_config
from logmetrics_spark.oracle import run_oracle
from logmetrics_spark.plans.pipeline import run_pipeline
from logmetrics_spark.session import get_spark
from logmetrics_spark.sources.synth import (
    SynthSpec,
    gen_hosts_lookup_dict,
    gen_hosts_lookup_pdf,
    gen_pages_pdf,
)

N = int(sys.argv[1]) if len(sys.argv) > 1 else 120
CONF = sys.argv[2] if len(sys.argv) > 2 else "configs/apache.toml"

spec = SynthSpec(n_rows=N, time_span_seconds=600)
pdf = gen_pages_pdf(np.arange(N), spec)
cfg = load_config(CONF)

spark = get_spark("smoke", master="local[4]", shuffle_partitions=8)
pages = spark.createDataFrame(pdf)
lookups_spark = {"hosts": spark.createDataFrame(gen_hosts_lookup_pdf())}
res = run_pipeline(spark, cfg, pages, io=None, lookups=lookups_spark, write=False)
engine_rows = [(r["line"], r["sink"]) for r in res.routed.collect()]

oracle_rows = [
    (r["line"], r["sink"])
    for r in run_oracle(pdf.to_dict("records"), cfg, {"hosts": gen_hosts_lookup_dict()})
]

print("engine:", len(engine_rows), "oracle:", len(oracle_rows))
e, o = collections.Counter(engine_rows), collections.Counter(oracle_rows)
only_e = list((e - o).elements())[:6]
only_o = list((o - e).elements())[:6]
print("only engine:", *only_e, sep="\n  ")
print("only oracle:", *only_o, sep="\n  ")
assert e == o, f"MISMATCH: {len(list((e-o).elements()))} extra engine, {len(list((o-e).elements()))} extra oracle"
print("MATCH OK")
spark.stop()
