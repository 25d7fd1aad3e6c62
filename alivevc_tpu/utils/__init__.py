from alivevc_tpu.utils.metrics import MetricsLogger, RealTimeFactorMeter, StepTimer
from alivevc_tpu.utils.profiling import device_time, profile_trace
from alivevc_tpu.utils.plotting import plot_spectrogram
