from minisgl_tpu.quality.nll import score_nll

__all__ = ["score_nll"]
