from momentum_tpu.math import euler, generalized_loss, quaternion, skel_state  # noqa: F401
