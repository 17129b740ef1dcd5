from minisgl_tpu.spec.lookup import propose_lookup_drafts

__all__ = ["propose_lookup_drafts"]
