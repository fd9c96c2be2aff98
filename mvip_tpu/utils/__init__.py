from mvip_tpu.utils.imaging import to8b, save_image, save_video
from mvip_tpu.utils.profiling import StepTimer
