from cnns_slfp_quantization_tpu.kernels import quantize  # noqa: F401
