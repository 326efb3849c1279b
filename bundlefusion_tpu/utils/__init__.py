from bundlefusion_tpu.utils.metrics import evaluate_ate_rmse  # noqa: F401
from bundlefusion_tpu.utils.timing import TimingLog, FrameTiming  # noqa: F401
