from hdrtv_tpu.parallel.mesh import (  # noqa: F401
    make_mesh,
    frame_sharding,
    replicate_params,
    shard_frames,
)
