"""Native-fronted serving: the C++ block scheduler driving the jitted chain.

The reference's serving plane is its audio callback: the ISR hands the
engine one block, the engine must return inside the budget, and block
transport around the DSP core rides lock-free rings
(AudioEngine.Processing.BlockDouble.cpp; LockFreeAudioRingBuffer.h).  The
TPU re-expression splits that plane in two:

- **native side** (`native/convopeq_native.cpp` `cq_sched_*`): per-stream
  SPSC input/output rings of stereo blocks, batch gather/commit framing,
  and deadline accounting (XRUN when a dispatch window's wall time
  exceeds 1.5x its budget) — all lock-free C++, no Python allocation on
  the block path beyond the batch buffers;
- **device side**: one jitted `StreamingChain.step` per gather, batched
  over ALL streams (a stream with no input ready is zero-filled —
  real-time semantics: an underrun plays silence — and its output window
  is not committed).

`NativeServingLoop.serve` is the dispatcher: any number of producer
threads `push(stream, block)` concurrently (one producer per stream —
SPSC), consumers `pop(stream)` processed blocks, and the loop gathers /
steps / commits until it has served the requested number of windows.
"""
from __future__ import annotations

import time

import numpy as np

from ..utils.native import NativeBlockScheduler


class NativeServingLoop:
    """Dispatcher between the native block scheduler and a StreamingChain."""

    def __init__(self, chain, n_streams: int, capacity_blocks: int = 64,
                 xrun_factor: float = 1.5, warmup: bool = True,
                 window_samples: int | None = None):
        """window_samples: samples per dispatch unit (default one engine
        block).  The windowed serving tiers (bigblock: partition =
        block*M) dispatch M engine blocks per step; the native rings
        then frame window-sized chunks — same lock-free plane, fewer,
        larger windows (the deadline budget scales with the window)."""
        import jax.numpy as jnp
        self.chain = chain
        self.n_streams = n_streams
        self.block = int(window_samples or chain.block_size)
        self.sched = NativeBlockScheduler(
            n_streams, self.block, chain.cfg.sample_rate,
            capacity_blocks=capacity_blocks, xrun_factor=xrun_factor)
        self.state = chain.init_state((n_streams,))
        self._jnp = jnp
        if warmup:
            # prepareToPlay analog: compile + warm the step on silence so
            # the first served window's wall is serving, not compilation.
            # Runs on a THROWAWAY state: under donate_state=True the step
            # donates its input state's buffers, and warming on self.state
            # would leave serve_window dereferencing deleted arrays.
            z = jnp.zeros((n_streams, 2, self.block), chain.dtype)
            _, y = chain.step(chain.init_state((n_streams,)), z)
            np.asarray(y)

    # producer / consumer pass-throughs -------------------------------
    def push(self, stream: int, block2ch) -> bool:
        return self.sched.push(stream, block2ch)

    def pop(self, stream: int):
        return self.sched.pop(stream)

    def stats(self) -> dict:
        return self.sched.stats()

    # dispatcher ------------------------------------------------------
    def serve_window(self) -> int:
        """One gather -> step -> commit cycle.  Returns the number of
        ready streams served (0 = nothing was ready; state untouched)."""
        batch, mask, n = self.sched.gather()
        if n == 0:
            return 0
        t0 = time.perf_counter_ns()
        state, y = self.chain.step(self.state, self._jnp.asarray(batch))
        y = np.asarray(y)               # fence: the wall must include it
        wall_ns = time.perf_counter_ns() - t0
        self.state = state
        self.sched.commit(y, mask, wall_ns)
        return int(n)

    def serve(self, n_windows: int, idle_sleep_s: float = 2e-4,
              timeout_s: float = 60.0) -> dict:
        """Serve until `n_windows` non-empty windows completed (or
        timeout).  Returns the native stats dict."""
        deadline = time.monotonic() + timeout_s
        done = 0
        while done < n_windows:
            if self.serve_window():
                done += 1
            else:
                if time.monotonic() > deadline:
                    break
                time.sleep(idle_sleep_s)
        return self.stats()
