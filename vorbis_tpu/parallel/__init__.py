"""Multi-chip sharding of the stream/frame batch axes."""

from .mesh import (make_codec_mesh, shard_frames,
                   sharded_encode_step, sharded_roundtrip_step)

__all__ = ["make_codec_mesh", "shard_frames", "sharded_encode_step",
           "sharded_roundtrip_step"]
