from playground3d_tpu.losses.focal import detection_loss

__all__ = ["detection_loss"]
