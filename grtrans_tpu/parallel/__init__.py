from grtrans_tpu.parallel.sharding import (pixel_mesh, shard_pixels,
                                           render_sharded)
