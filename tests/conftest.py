import numpy as np
import pytest

from logmetrics_spark.config import load_config
from logmetrics_spark.session import get_spark
from logmetrics_spark.sources.synth import SynthSpec, gen_pages_pdf

REPO = "/root/repo"


@pytest.fixture(scope="session")
def spark():
    s = get_spark(
        "tests",
        master="local[4]",
        shuffle_partitions=8,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    yield s
    s.stop()


@pytest.fixture(scope="session")
def spec():
    return SynthSpec(n_rows=150, time_span_seconds=400)


@pytest.fixture(scope="session")
def pages_pdf(spec):
    return gen_pages_pdf(np.arange(spec.n_rows), spec)


@pytest.fixture(scope="session")
def pages(spark, pages_pdf):
    return spark.createDataFrame(pages_pdf)


@pytest.fixture(scope="session")
def rest_cfg():
    return load_config(f"{REPO}/configs/rest_api.toml")


@pytest.fixture(scope="session")
def apache_cfg():
    return load_config(f"{REPO}/configs/apache.toml")
