from .mesh import make_mesh, factor_devices, init_distributed
from .shard_conv import conv_sep_sharded, shard_halo
from .shard_match import nn_match_ring, nn_match_sharded
from .shard_windows import (descrip_level_sharded, descrip_level_z_sharded,
                            orient_level_sharded, orient_level_z_sharded)
from .shard_extrema import level_extrema_sharded
