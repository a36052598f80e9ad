from grafp_tpu.data.audio_io import load_audio, save_wav
from grafp_tpu.data.resample import resample_sinc
from grafp_tpu.data.indexing import load_index, load_augmentation_index, update_index
from grafp_tpu.data.dataset import FingerprintDataset, PairBatcher, TrackLoader
