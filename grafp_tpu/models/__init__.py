from grafp_tpu.models.gnn import GraphEncoder, Grapher, FFN, Downsample
from grafp_tpu.models.peak_embed import PeakEmbed
from grafp_tpu.models.simclr import SimCLRModel, build_model
