from mvip_tpu.train.losses import img2mse, img2l1, mse2psnr
from mvip_tpu.train.state import TrainState, create_train_state, make_optimizer
from mvip_tpu.train.step import make_train_step, DeviceStreams
from mvip_tpu.train.checkpoint import CheckpointManager
from mvip_tpu.train.loop import train
