from goliath_tpu.nn import blocks, color_cal, dof_cal, face, layers, shadow, unet  # noqa: F401
