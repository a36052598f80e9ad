from grafp_tpu.dsp.melspec import LogMelConfig, log_mel_spectrogram, mel_filterbank
from grafp_tpu.dsp.segment import unfold_segments, num_segments
from grafp_tpu.dsp.augment import apply_ir, mix_noise_at_snr, AugmentBanks, augment_waveforms
