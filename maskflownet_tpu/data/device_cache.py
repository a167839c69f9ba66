"""HBM-resident batch cache with background refresh (bounded data echoing).

Motivation: the train step is compiled into one XLA program and runs entirely
on device, so training throughput is ``max(step_time, batch_bytes /
link_bandwidth)``. When the host->device link is slow relative to the step
(measured 41 MB/s on a tunneled PJRT backend, ~385 ms for a chairs batch vs a
~100 ms step), the wire — not the TPU — sets the ceiling, exactly like an
underprovisioned input host on a pod slice.

``DeviceBatchCache`` keeps ``slots`` full batches resident in device HBM.
The training loop samples a slot every step (uniform, no immediate repeat)
while a daemon thread keeps streaming fresh host batches over the link,
replacing slots round-robin. Each transferred batch is therefore reused
``~step_rate/refresh_rate`` times — bounded data echoing (Choi et al. 2020,
"Faster Neural Network Training with Data Echoing", arXiv:1907.05550).

How benign echoing is depends on where augmentation runs. Color augmentation
executes on device *inside* the jitted train step with a fresh PRNG key each
step, so every reuse gets a brand-new chromatic draw. Geometry is different:
with ``--aug device`` it too is redrawn per step, but with the default
``--aug host`` the crop/warp is baked into the cached batch at refresh time,
so echoes of one slot repeat the same geometry and only refreshes bring a
new draw. Empirical check (CONVERGENCE_r02.json): a 20k-step run with host
geometry aug and echo_factor ~60 still drove held-out EPE 15.0 -> 0.29 px —
echoing slowed nothing measurable on that curriculum — but the factor is
tracked (:attr:`echo_factor`) and recorded by ``bench.py`` and
``tools/convergence.py`` precisely so regressions are visible rather than
assumed away.

For datasets that fit in HBM (FlyingChairs is ~43 GB at full resolution —
fits a 95 GB v5p chip; a 370-batch KITTI fine-tune set fits anything), set
``slots >= len(dataset)/batch_size`` and after one epoch the cache holds the
entire dataset; the refresh thread then just keeps rotating fresh shuffles.

Reference parity note: the reference's input pipeline is ``Queue``-threaded
host loading + synchronous per-step ``split_and_load`` (``main.py:480-509``,
``pipeline.py:95``); this module is the TPU-native upgrade of that stage.
"""

from __future__ import annotations

import random
import threading

import jax

from maskflownet_tpu.parallel.mesh import batch_sharding, shard_batch


class DeviceBatchCache:
    """Pool of device-resident batches fed by ``source()`` on a daemon thread.

    Parameters
    ----------
    source: callable returning the next host batch (tuple of numpy arrays),
        or None to signal exhaustion (refresh then stops; cached slots keep
        serving).
    mesh: the data mesh; batches are placed with its batch sharding.
    slots: number of batches to keep resident. HBM cost = slots *
        batch_bytes (a chairs batch of 8 is ~16 MB -> 64 slots = 1 GB).
    transform: optional host-side preprocessing before transfer.
    seed: RNG seed for slot sampling.
    """

    def __init__(self, source, mesh, slots: int = 16, transform=None,
                 seed: int = 0):
        self._mesh = mesh
        self._slots: list = [None] * slots
        self._n_ready = 0
        self._lock = threading.Lock()
        self._ready = threading.Event()
        self._stop = False
        self._rng = random.Random(seed)
        self._last = -1
        self.transfers = 0      # batches that crossed the wire
        self.serves = 0         # batches handed to the training loop
        self._error: BaseException | None = None

        def worker():
            try:
                self._fill(source, transform, mesh, slots)
            except BaseException as e:  # surface in get(), don't hang
                self._error = e
                self._ready.set()

        self._thread = threading.Thread(target=worker, daemon=True)
        self._thread.start()

    def _fill(self, source, transform, mesh, slots):
        i = 0
        while not self._stop:
            batch = source()
            if batch is None:
                break
            if transform is not None:
                batch = transform(batch)
            dev = shard_batch(mesh, tuple(batch))
            if jax.process_count() == 1:
                # pin resident NOW (shard_batch defers single-process
                # transfer to the step's in_shardings; a cache must not)
                if mesh.devices.size == 1:
                    dev = tuple(jax.device_put(x, mesh.devices.flat[0])
                                for x in dev)
                else:
                    sh = batch_sharding(mesh)
                    dev = tuple(jax.device_put(x, sh) for x in dev)
            jax.block_until_ready(dev)
            with self._lock:
                self._slots[i % slots] = dev
                self._n_ready = min(self._n_ready + 1, slots)
                self.transfers += 1
            self._ready.set()
            i += 1

    def get(self):
        """A device-resident batch; blocks only until the first slot fills."""
        self._ready.wait()
        if self._error is not None:
            raise RuntimeError("DeviceBatchCache refresh thread failed") \
                from self._error
        with self._lock:
            n = self._n_ready
            if 0 <= self._last < n and n > 1:
                j = self._rng.randrange(n - 1)
                if j >= self._last:
                    j += 1          # uniform over ready slots != last
            else:
                j = self._rng.randrange(n) if n > 1 else 0
            self._last = j
            self.serves += 1
            return self._slots[j]

    @property
    def echo_factor(self) -> float:
        """Mean reuses per transferred batch so far."""
        return self.serves / max(1, self.transfers)

    def reset_stats(self) -> None:
        """Zero the serve/transfer counters under the refresh thread's lock
        (an unsynchronized reset races the thread's ``transfers += 1``)."""
        with self._lock:
            self.serves = 0
            self.transfers = 0

    def stop(self, timeout: float = 30.0):
        """Signal the refresh thread and wait for it to finish its in-flight
        transfer. Joining matters: a daemon thread still inside
        ``jax.device_put`` when the interpreter tears down the PJRT runtime
        aborts the process from C++ (observed on the tunneled backend)."""
        self._stop = True
        self._thread.join(timeout=timeout)
