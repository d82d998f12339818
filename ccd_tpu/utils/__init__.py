from ccd_tpu.utils.logging import Logger
from ccd_tpu.utils.meters import Averager, MetricLogger, SmoothedValue, Timer

__all__ = ["Logger", "Averager", "MetricLogger", "SmoothedValue", "Timer"]
