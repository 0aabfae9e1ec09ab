"""Webdataset-format pipeline, dependency-free.

Replaces the reference's webdataset stack (open_flamingo/train/
data_utils.py): tar shards of samples grouped by key prefix, deterministic
per-epoch shard shuffling identical across hosts (detshuffle2 semantics,
data_utils.py:159-188), with-replacement resampling (ResampledShards2,
data_utils.py:191-234), host/worker shard splitting (split_by_node /
split_by_worker), error-swallowing sample iteration
(tarfile_to_samples_nothrow / log_and_continue, data_utils.py:97-142),
and a threaded prefetch loader feeding fixed-shape numpy batches to
jax.device_put.
"""

from __future__ import annotations

import dataclasses
import logging
import multiprocessing as mp
import queue
import random
import re
import tarfile
import threading
from typing import Any, Callable, Dict, Iterable, Iterator, List, Optional, Sequence, Tuple

log = logging.getLogger(__name__)


# --- shard lists -----------------------------------------------------------


def braceexpand(pattern: str) -> List[str]:
    """Expand {0000..0099} ranges and {a,b} alternations (the subset of
    brace syntax webdataset urls use)."""
    m = re.search(r"\{([^{}]*)\}", pattern)
    if not m:
        return [pattern]
    body = m.group(1)
    rng = re.fullmatch(r"(\d+)\.\.(\d+)", body)
    if rng:
        lo, hi = rng.group(1), rng.group(2)
        width = len(lo)
        parts = [str(i).zfill(width) for i in range(int(lo), int(hi) + 1)]
    elif "," in body:
        parts = body.split(",")
    else:
        parts = [body]
    out = []
    for p in parts:
        out.extend(braceexpand(pattern[: m.start()] + p + pattern[m.end():]))
    return out


def expand_urls(urls) -> List[str]:
    if isinstance(urls, str):
        urls = urls.split("::")
    out: List[str] = []
    for u in urls:
        out.extend(braceexpand(u))
    return out


def detshuffle(items: Sequence[Any], seed: int, epoch: int) -> List[Any]:
    """Deterministic shuffle, identical on every host (detshuffle2:
    rng seeded with seed + epoch)."""
    out = list(items)
    random.Random(seed + epoch).shuffle(out)
    return out


def resampled_shards(
    urls: Sequence[str], n: int, seed: int, epoch: int
) -> List[str]:
    """Sample n shards with replacement, deterministic per (seed, epoch)."""
    rng = random.Random()
    rng.seed(seed + epoch)
    return [rng.choice(list(urls)) for _ in range(n)]


def split_shards(
    shards: Sequence[str],
    host_id: int,
    num_hosts: int,
    worker_id: int = 0,
    num_workers: int = 1,
) -> List[str]:
    """split_by_node then split_by_worker (round-robin slicing)."""
    per_host = list(shards)[host_id::num_hosts]
    return per_host[worker_id::num_workers]


# --- tar sample iteration --------------------------------------------------


def _base_ext(name: str):
    name = name.rsplit("/", 1)[-1]
    if "." not in name:
        return name, ""
    base, ext = name.split(".", 1)
    return base, ext.lower()


def tar_samples(
    path_or_fileobj, handler: Optional[Callable[[Exception], bool]] = None
) -> Iterator[Dict[str, Any]]:
    """Yield {'__key__': k, ext: bytes, ...} grouping consecutive members
    by key prefix. Corrupt members/shards are logged and skipped, and a
    repeated key starts a new sample instead of aborting
    (group_by_keys_nothrow semantics, data_utils.py:103-142)."""
    try:
        if isinstance(path_or_fileobj, (str, bytes)):
            tf = tarfile.open(path_or_fileobj, mode="r|*")
        else:
            tf = tarfile.open(fileobj=path_or_fileobj, mode="r|*")
    except Exception as e:  # unreadable shard: swallow (log_and_continue)
        log.warning("skipping unreadable shard %r: %r", path_or_fileobj, e)
        return

    current: Dict[str, Any] = {}
    with tf:
        try:
            for member in tf:
                if not member.isfile():
                    continue
                base, ext = _base_ext(member.name)
                if base.startswith("__"):
                    continue
                try:
                    data = tf.extractfile(member).read()
                except Exception as e:
                    log.warning("skipping corrupt member %s: %r", member.name, e)
                    continue
                if current and (
                    current.get("__key__") != base or ext in current
                ):
                    yield current
                    current = {}
                current.setdefault("__key__", base)
                current[ext] = data
        except Exception as e:
            log.warning("truncated shard %r: %r", path_or_fileobj, e)
    if current:
        yield current


def shards_to_samples(
    shards: Iterable[str],
    open_fn: Optional[Callable[[str], Any]] = None,
) -> Iterator[Dict[str, Any]]:
    for shard in shards:
        src = open_fn(shard) if open_fn else shard
        yield from tar_samples(src)


# --- stream transforms -----------------------------------------------------


def shuffle_buffer(
    it: Iterator[Any], bufsize: int, seed: Optional[int] = None
) -> Iterator[Any]:
    """Reservoir-style streaming shuffle (wds.shuffle semantics)."""
    rng = random.Random(seed)
    buf: List[Any] = []
    for x in it:
        if len(buf) < bufsize:
            buf.append(x)
            continue
        i = rng.randrange(len(buf))
        yield buf[i]
        buf[i] = x
    rng.shuffle(buf)
    yield from buf


def map_safe(
    it: Iterator[Any], fn: Callable[[Any], Any]
) -> Iterator[Any]:
    """Map, swallowing per-sample errors (rejection sampling raises
    ValueError in the reference, data.py:239-263)."""
    for x in it:
        try:
            yield fn(x)
        except Exception as e:
            log.debug("dropping sample: %r", e)


def batched(
    it: Iterator[Any], batch_size: int, collate: Callable[[List[Any]], Any],
    drop_last: bool = True,
) -> Iterator[Any]:
    buf: List[Any] = []
    for x in it:
        buf.append(x)
        if len(buf) == batch_size:
            yield collate(buf)
            buf = []
    if buf and not drop_last:
        yield collate(buf)


# --- epoch plumbing / loader ----------------------------------------------


class SharedEpoch:
    """Epoch counter shared with loader workers (data_utils.py:34-42);
    threads share memory so a plain attribute suffices."""

    def __init__(self, epoch: int = 0):
        self._epoch = epoch
        self._lock = threading.Lock()

    def set_value(self, epoch: int):
        with self._lock:
            self._epoch = epoch

    def get_value(self) -> int:
        with self._lock:
            return self._epoch


class PrefetchLoader:
    """Multi-worker threaded loader with a bounded prefetch queue.

    make_worker_iter(worker_id, epoch) must return an iterator of batches;
    each worker consumes a disjoint shard subset. num_batches bounds an
    epoch so every host sees an identical batch count (the reference
    rounds via num_worker_batches, data.py:444-457).
    """

    def __init__(
        self,
        make_worker_iter: Callable[[int, int], Iterator[Any]],
        num_workers: int,
        num_batches: int,
        shared_epoch: Optional[SharedEpoch] = None,
        prefetch: int = 4,
    ):
        self.make_worker_iter = make_worker_iter
        self.num_workers = max(1, num_workers)
        self.num_batches = num_batches
        self.shared_epoch = shared_epoch or SharedEpoch()
        self.prefetch = prefetch

    def __len__(self):
        return self.num_batches

    def __iter__(self):
        epoch = self.shared_epoch.get_value()
        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()
        SENTINEL = object()

        def worker(wid: int):
            try:
                for batch in self.make_worker_iter(wid, epoch):
                    if stop.is_set():
                        return
                    q.put(batch)
            except Exception as e:  # pragma: no cover
                log.exception("loader worker %d failed: %r", wid, e)
            finally:
                q.put(SENTINEL)

        threads = [
            threading.Thread(target=worker, args=(w,), daemon=True)
            for w in range(self.num_workers)
        ]
        for t in threads:
            t.start()

        served, finished = 0, 0
        try:
            while served < self.num_batches and finished < self.num_workers:
                item = q.get()
                if item is SENTINEL:
                    finished += 1
                    continue
                yield item
                served += 1
        finally:
            stop.set()
            # drain so workers blocked on put() can observe stop
            while True:
                try:
                    q.get_nowait()
                except queue.Empty:
                    break


def _mp_worker(out_q, worker_fn, worker_args, wid: int, epoch: int):
    """Child-process body: run one worker's batch iterator into a queue.

    Module-level so it is importable under the 'spawn' start method. The
    child never touches jax — the data modules import only
    numpy/scipy/PIL, so spawn startup stays light and the TPU client in
    the parent is never forked.
    """
    try:
        for batch in worker_fn(wid, epoch, *worker_args):
            out_q.put(batch)
    except Exception as e:  # pragma: no cover
        log.exception("loader process %d failed: %r", wid, e)
    finally:
        out_q.put(None)  # sentinel


class ProcessPrefetchLoader:
    """Multi-worker *process* loader (GIL-free JPEG decode/PIL resize).

    Same contract as PrefetchLoader but worker_fn must be a module-level
    picklable callable `worker_fn(worker_id, epoch, *worker_args)`
    returning an iterator of batches. Replaces the reference's
    torch DataLoader(num_workers=N) process pool
    (open_flamingo/train/data.py:459-465) without torch: a 'spawn'
    context keeps children free of the parent's TPU/jax state.
    """

    def __init__(
        self,
        worker_fn: Callable[..., Iterator[Any]],
        worker_args: Tuple,
        num_workers: int,
        num_batches: int,
        shared_epoch: Optional["SharedEpoch"] = None,
        prefetch: int = 8,
    ):
        self.worker_fn = worker_fn
        self.worker_args = tuple(worker_args)
        self.num_workers = max(1, num_workers)
        self.num_batches = num_batches
        self.shared_epoch = shared_epoch or SharedEpoch()
        self.prefetch = prefetch

    def __len__(self):
        return self.num_batches

    def __iter__(self):
        epoch = self.shared_epoch.get_value()
        ctx = mp.get_context("spawn")
        q = ctx.Queue(maxsize=max(self.prefetch, self.num_workers))
        procs = [
            ctx.Process(
                target=_mp_worker,
                args=(q, self.worker_fn, self.worker_args, w, epoch),
                daemon=True,
            )
            for w in range(self.num_workers)
        ]
        for p in procs:
            p.start()

        served, finished = 0, 0
        try:
            while served < self.num_batches and finished < self.num_workers:
                # Watchdog: a hard worker death (OOM-kill, segfault in
                # PIL/libjpeg) never posts the sentinel from its finally
                # block, so a bare q.get() would hang the train loop
                # forever. Poll with a timeout and treat a dead worker
                # without a sentinel as finished (torch DataLoader's
                # worker-watchdog semantics).
                try:
                    item = q.get(timeout=5.0)
                except queue.Empty:
                    if not any(p.is_alive() for p in procs) and q.empty():
                        log.error(
                            "all loader processes exited with %d/%d "
                            "sentinels received (hard worker death?); "
                            "ending epoch early",
                            finished, self.num_workers,
                        )
                        break
                    continue
                if item is None:
                    finished += 1
                    continue
                yield item
                served += 1
        finally:
            for p in procs:
                p.terminate()
            for p in procs:
                p.join(timeout=5)
            q.close()
            q.cancel_join_thread()


@dataclasses.dataclass
class DataInfo:
    """Mirror of data_utils.py:45-55."""

    dataloader: Any
    shared_epoch: Optional[SharedEpoch] = None

    def set_epoch(self, epoch: int):
        if self.shared_epoch is not None:
            self.shared_epoch.set_value(epoch)
