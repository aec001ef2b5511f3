from seamless_communication_tpu.denoise.denoiser import Denoiser  # noqa: F401
