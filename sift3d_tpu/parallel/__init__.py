from .mesh import make_mesh, factor_devices
from .shard_conv import conv_sep_sharded, shard_halo
