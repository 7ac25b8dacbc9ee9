from .detectors import ALGORITHMS, DETECTOR_VERSIONS  # noqa: F401
from .ensemble import EnsembleResult, run_ensemble  # noqa: F401
