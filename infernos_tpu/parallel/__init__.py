from .mesh import make_mesh, shard_tts_state, replicate

__all__ = ["make_mesh", "shard_tts_state", "replicate"]
