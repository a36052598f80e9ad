from grafp_tpu.core.config import Config, load_config, override
from grafp_tpu.core.mesh import make_mesh, data_sharding, replicated_sharding
