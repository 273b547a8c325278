from hand3d_tpu.utils.viz import plot_hand, plot_hand_3d, HAND_BONES

__all__ = ["plot_hand", "plot_hand_3d", "HAND_BONES"]
