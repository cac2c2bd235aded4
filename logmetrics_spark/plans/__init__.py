from .pipeline import run_pipeline, build_emissions, build_datapoints  # noqa: F401
