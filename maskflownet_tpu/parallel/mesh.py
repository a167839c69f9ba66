"""Device mesh + sharding helpers for data-parallel training.

TPU-native replacement for the reference's single-host multi-GPU
``split_and_load`` + KVStore gradient aggregation (``pipeline.py:95,114``):
one 1-D ``('data',)`` mesh spanning all devices (all hosts), the batch
sharded over it with ``NamedSharding``, parameters/optimizer state
replicated, and the gradient all-reduce compiled into the jitted train step
by XLA (riding ICI within a slice and DCN across hosts).

``initialize_distributed`` must run before any other JAX call on multi-host
pods; it is a no-op in single-process settings.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize_distributed(coordinator: str | None = None,
                           num_processes: int | None = None,
                           process_id: int | None = None) -> None:
    """Multi-host bring-up (``jax.distributed``); call once per process."""
    if num_processes is not None and num_processes > 1:
        jax.distributed.initialize(coordinator_address=coordinator,
                                   num_processes=num_processes,
                                   process_id=process_id)


def _rss_bytes():
    try:
        with open("/proc/self/status") as fp:
            for line in fp:
                if line.startswith("VmRSS"):
                    return int(line.split()[1]) * 1024
    except OSError:
        pass
    return None


def make_mesh(devices=None) -> Mesh:
    """1-D data-parallel mesh over all (global) devices."""
    devices = np.asarray(devices if devices is not None else jax.devices())
    return Mesh(devices, axis_names=("data",))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("data"))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


class DevicePrefetcher:
    """Double-buffered host->device transfer pipeline.

    Pulls host batches from ``source()`` on a background thread, starts the
    device transfer immediately, and hands device-resident batches to the
    training loop -- so input transfer overlaps step execution. This matters
    most when the accelerator is behind a slow host link (measured here:
    ~50-120 MB/s), where the reference-style synchronous ``split_and_load``
    would serialize ~300ms of transfer into every step.

    ``transform`` (optional) runs on the host thread before transfer (e.g.
    float16-casting flow labels to halve wire bytes).

    A host-RSS watchdog warns when process memory grows in step with the
    bytes this prefetcher has transferred: the tunneled PJRT client used on
    this rig retains EVERY host->device transfer's bytes in client RSS
    (measured 15 MB leaked per 15 MB batch over thousands of steps,
    unaffected by ``jax.Array.delete`` or host-buffer reuse -- a
    long no-reuse run OOMs the host). On such backends prefer
    :class:`~maskflownet_tpu.data.DeviceBatchCache` (rare transfers; the
    CLI default here); normally-attached TPU runtimes do not leak.
    """

    def __init__(self, source, mesh: Mesh, depth: int = 2, transform=None):
        import queue
        import threading

        self._q: "queue.Queue" = queue.Queue(maxsize=depth)
        self._mesh = mesh
        self._transform = transform
        self._stop = False
        self._bytes_sent = 0
        self._rss0 = _rss_bytes()
        self._leak_warned = False

        def worker():
            while not self._stop:
                batch = source()
                if batch is None:
                    self._q.put(None)
                    return
                if self._transform is not None:
                    batch = self._transform(batch)
                dev = shard_batch(mesh, tuple(batch))
                if jax.process_count() == 1 and mesh.devices.size == 1:
                    dev = tuple(jax.device_put(x, mesh.devices.flat[0])
                                for x in dev)
                self._bytes_sent += sum(x.nbytes for x in batch)
                self._check_leak()
                # bounded put so stop() can interrupt a producer blocked on
                # a full queue
                while not self._stop:
                    try:
                        self._q.put(dev, timeout=0.2)
                        break
                    except queue.Full:
                        continue

        self._thread = threading.Thread(target=worker, daemon=True)
        self._thread.start()

    def _check_leak(self):
        """Warn once if host RSS tracks cumulative transferred bytes (the
        tunneled-backend transfer leak documented in the class docstring)."""
        if self._leak_warned or self._bytes_sent < 4 << 30:
            return
        rss = _rss_bytes()
        if rss is not None and self._rss0 is not None \
                and rss - self._rss0 > 0.8 * self._bytes_sent:
            import warnings

            self._leak_warned = True
            warnings.warn(
                f"host RSS grew {((rss - self._rss0) >> 20)} MB while this "
                f"DevicePrefetcher transferred {self._bytes_sent >> 20} MB: "
                "the PJRT client appears to retain every host->device "
                "transfer (known behavior of the tunneled backend). A long "
                "no-reuse run will exhaust host memory -- prefer the "
                "device-cache input path (--device_cache) on this backend.",
                stacklevel=2)

    def get(self):
        return self._q.get()

    def stop(self, timeout: float = 30.0):
        """Signal the worker and join it. Joining matters: a daemon thread
        still inside ``jax.device_put`` when the interpreter tears down the
        PJRT runtime aborts the process from C++ (same failure mode fixed in
        ``DeviceBatchCache.stop``)."""
        import queue

        self._stop = True
        try:  # unblock a worker waiting on a full queue
            while True:
                self._q.get_nowait()
        except queue.Empty:
            pass
        self._thread.join(timeout=timeout)


def shard_batch(mesh: Mesh, batch):
    """Place host-local numpy arrays as a batch sharded over 'data'.

    Single-process: a plain ``device_put`` with the sharded layout. On
    multi-host pods each process contributes its local shard via
    ``jax.make_array_from_process_local_data`` (the input pipeline already
    loads only this host's fraction -- ``data.loader`` shard arguments).
    """
    if jax.process_count() == 1:
        # Hand host arrays straight to the jitted step: its in_shardings
        # drive the transfer. (A NamedSharding device_put takes a slow
        # per-shard path on some PJRT backends -- measured 52ms vs 3.4ms for
        # a 4.7MB array on the tunneled TPU backend here.)
        return batch
    sh = batch_sharding(mesh)
    return jax.tree_util.tree_map(
        lambda x: jax.make_array_from_process_local_data(sh, np.asarray(x)),
        batch)
