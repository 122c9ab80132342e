from .mesh import make_mesh, factor_devices, init_distributed
from .shard_conv import conv_sep_sharded, shard_halo
from .shard_match import nn_match_sharded
