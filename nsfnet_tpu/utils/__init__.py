from nsfnet_tpu.utils.tensorboard import ScalarWriter

__all__ = ["ScalarWriter"]
