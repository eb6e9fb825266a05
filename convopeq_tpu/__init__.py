"""convopeq_tpu — TPU-native batched audio-processing framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
lonewolf-jp/ConvoPeq (a Windows real-time convolution + parametric-EQ audio
processor): non-uniform partitioned FFT convolution, 20-band TPT-SVF
parametric EQ, polyphase Kaiser-halfband oversampling, gain staging, output
conditioning, soft clipping, dither/noise shaping, IR preparation
(resample / minimum-phase / mixed-phase), and BS.1770 metering — exposed as
pure functional transforms over jit-compiled graphs that process batches of
independent audio streams per TPU chip.

Design notes (TPU-first, not a port):
- All inherently-sequential IIR recurrences (SVF bands, biquads, DC blockers)
  are linear in their state, so they are evaluated with
  `jax.lax.associative_scan` over affine state maps — O(log N) depth instead
  of O(N), parallel across the VPU lanes.
- Partitioned convolution is batched frequency-domain MAC over a
  (blocks, partitions, bins) tensor — embarrassingly parallel.
- Per-sample *nonlinear feedback* stages (noise-shaper error feedback) use
  `lax.scan`, hidden behind batch parallelism across streams.
- No locks / RCU / threads: the reference's runtime-governance plane
  collapses into functional state threading + jit caching.
"""

__version__ = "0.1.0"
