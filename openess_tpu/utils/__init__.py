from openess_tpu.utils.profiling import StepTimer, Timer, timer_summary, trace
from openess_tpu.utils.slic import slic
from openess_tpu.utils.viz import colorize_semseg, event_image, save_png

__all__ = [
    "StepTimer",
    "Timer",
    "colorize_semseg",
    "event_image",
    "save_png",
    "slic",
    "timer_summary",
    "trace",
]
