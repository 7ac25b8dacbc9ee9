from .synth import PAGE_SCHEMA, synth_pages  # noqa: F401
