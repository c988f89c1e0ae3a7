from acvae_tpu.ops.pallas.warp_kernel import time_warp_1d
