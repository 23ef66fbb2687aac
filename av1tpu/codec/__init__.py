from av1tpu.codec.partitions import *  # noqa: F401,F403
