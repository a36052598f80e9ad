"""grafp_tpu — a TPU-native audio-fingerprinting framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of GraFPrint
(ICASSP 2025, reference: chymaera96/GraFP): self-supervised SimCLR training
of a k-NN graph neural network mapping 1-second log-mel segments to 128-d
fingerprints, fingerprint database generation at scale, and robust retrieval
evaluation — all running on TPU via jit/pjit over a device mesh, with Pallas
kernels on the hot paths and an on-TPU ANN engine replacing FAISS.

Layer map (bottom-up):
    core/       typed config, RNG discipline, mesh/topology, metrics sinks
    dsp/        log-mel frontend, augmentations (RIR + SNR noise), segmenting
    data/       dataset indexing, host audio IO, prefetching loaders
    models/     PeakEmbed, GraphEncoder (ViG/MRConv), SimCLR head, baselines
    ops/        Pallas kernels + XLA reference implementations of hot ops
    train/      NT-Xent loss, pjit train step, optimizer, checkpointing
    fp/         fingerprint database builders (static-shape, sharded)
    retrieval/  on-TPU exact & ANN (IVF/PQ/LSH) search + sequence rescoring
    cli/        entry points mirroring the reference CLI contract
"""

__version__ = "0.1.0"
