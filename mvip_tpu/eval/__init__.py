from mvip_tpu.eval.metrics import psnr, ssim, mse
