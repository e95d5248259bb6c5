"""Watch-directory serving: a persistent compiled model over a frame
stream.

Production detector pipelines drop frames into a directory; this mode
keeps ONE process alive with the generator compiled once and upscales
each new frame as it appears.  Cold-start honesty (measured on this
environment's tunneled v5e, round 3/4): the first frame pays the full
XLA+Mosaic compile of the production inference graph — ~10–20 min cold
(bench.py measured 1174 s at round-3 shipping defaults).  Two things
make that a one-time cost, not a per-restart cost: (a) this process
stays resident, so frames 2..N run at full chip rate, and (b) the
persistent compilation cache (compile_cache.py, on by default in the
CLI) turns every LATER process start into a disk load of the cached
executable (warm-restart numbers in BENCHNOTES.md round 4).  Re-invoking
``cli upscale`` per frame would still pay dispatch + load per frame;
a resident server IS the deployment story (SURVEY.md §1 L6).

Mechanics: poll the watch dir (os.scandir — cheap; no inotify
dependency), claim each unprocessed image by its (name, mtime, size)
signature, upscale through the tiled path (fixed tile shapes → no
recompiles regardless of frame size), write ``<stem>_x<scale>.png`` to
the output dir, and append a JSONL record (frame, shapes, seconds,
MP/s) to ``serve_log.jsonl``.  A frame is reprocessed if its file
changes (new mtime/size).  Files still being written are skipped until
their size is stable across two polls.

Geometry (round 5: the DEFAULT flags are the fast path): on the fused
TPU path the CLI resolves rate-aware bucketed column tiling — tall cap,
128-wide columns, 64-row height bucket — so the planner
(``parallel/tiling.py bucket_tile_h``) picks the measured-winner capped
column per frame height (41.07 MP/s/chip on 2048², 40.47 at 1920-high,
BENCHNOTES round-5 campaign) and a variable-height fixed-width stream
reuses a BOUNDED set of compiled shapes.  ``--halo`` defaults to
``auto``: release checkpoints exported with ``cli export`` carry their
stamped admissible halo in ``<release>.pth.meta.json`` (a property of
the trained weights' effective receptive field — the round-4 GAN
weights cleared halo=4 at 60 dB tiled-vs-whole, the round-5 10k run
stamped 6), with a conservative halo=8 fallback when no stamp exists.
The lax/CPU path keeps the square-384/b2 grid (column streaming buys
nothing without the fused kernels).  ``--prewarm WxH,...`` compiles the
expected frame sizes before watching.
"""

from __future__ import annotations

import json
import os
import time
from typing import Callable, Dict, Optional, Tuple

import numpy as np

IMAGE_EXTS = (".png", ".jpg", ".jpeg", ".bmp", ".tif", ".tiff", ".webp")


def _signature(path: str) -> Optional[Tuple[float, int]]:
    try:
        st = os.stat(path)
        return (st.st_mtime, st.st_size)
    except OSError:
        return None


def _scan(watch_dir: str) -> Dict[str, Tuple[float, int]]:
    out = {}
    try:
        with os.scandir(watch_dir) as it:
            for e in it:
                if e.is_file() and e.name.lower().endswith(IMAGE_EXTS):
                    st = e.stat()
                    out[e.path] = (st.st_mtime, st.st_size)
    except FileNotFoundError:
        pass
    return out


def serve_watch(
        upscale_fn: Callable[[np.ndarray], np.ndarray],
        watch_dir: str,
        out_dir: str,
        scale: int = 4,
        poll_s: float = 0.5,
        once: bool = False,
        max_frames: Optional[int] = None,
        log_path: Optional[str] = None,
        pipeline_write: bool = True,
) -> int:
    """Run the watch loop.  ``upscale_fn``: uint8 HWC LR → uint8 HWC SR.
    ``once`` drains the current backlog and returns; otherwise loops
    until ``max_frames`` processed (None = forever).  Returns the number
    of frames processed (all outputs are on disk when it returns).

    ``pipeline_write`` (default on) moves PNG encode + save + log-append
    into ONE background writer thread with a depth-1 queue: the encode
    of frame N (seconds of single-core zlib at 8K output) overlaps the
    decode + device compute of frame N+1 instead of serializing with it.
    A single FIFO writer preserves per-frame output/log order; the
    depth-1 bound caps in-flight SR frames (an 8192² uint8 frame is
    ~200 MB).  Writer failures re-raise on the serve thread.  The
    restart-resilience contract is unchanged: the durable processed
    record is the output file's mtime, written strictly after a
    successful encode."""
    import queue as _queue
    import threading

    from PIL import Image

    from super_resolution_tpu.data.image_io import merge_alpha, split_alpha

    os.makedirs(out_dir, exist_ok=True)
    log_path = log_path or os.path.join(out_dir, "serve_log.jsonl")
    done: Dict[str, Tuple[float, int]] = {}
    pending: Dict[str, Tuple[float, int]] = {}
    n = 0

    def _save_and_log(dst, arr, rec):
        Image.fromarray(arr).save(dst)
        with open(log_path, "a") as f:
            f.write(json.dumps(rec) + "\n")
        print(f"[serve] {rec['frame']}: {rec['lr'][1]}x{rec['lr'][0]} → "
              f"{rec['sr'][1]}x{rec['sr'][0]} in {rec['seconds']:.2f}s "
              f"({rec['mp_per_sec']} MP/s)", flush=True)

    wq = werr = wt = None
    if pipeline_write:
        wq = _queue.Queue(maxsize=1)
        werr = []

        def _writer():
            while True:
                item = wq.get()
                try:
                    if item is None:
                        return
                    _save_and_log(*item)
                except Exception as e:
                    werr.append(e)
                finally:
                    wq.task_done()

        wt = threading.Thread(target=_writer, daemon=True,
                              name="serve-writer")
        wt.start()

    def _flush(count: int) -> int:
        if wq is not None:
            wq.join()
            wq.put(None)
            wt.join()
            if werr:
                raise werr[0]
        return count

    while True:
        seen = _scan(watch_dir)
        for path, sig in sorted(seen.items()):
            if werr:
                return _flush(n)            # re-raises the writer error
            if done.get(path) == sig:
                continue
            stem, _ = os.path.splitext(os.path.basename(path))
            dst = os.path.join(out_dir, f"{stem}_x{scale}.png")
            # restart resilience: an output at least as new as the input
            # counts as processed (the in-process `done` map dies with
            # the process; the filesystem is the durable record)
            dsig = _signature(dst)
            if dsig is not None and dsig[0] >= sig[0]:
                done[path] = sig
                continue
            # require a stable signature across two polls so half-written
            # frames are not decoded
            if not once and pending.get(path) != sig:
                pending[path] = sig
                continue
            pending.pop(path, None)

            sig2 = _signature(path)
            if sig2 is None:
                continue
            with Image.open(path) as im:
                lr_u8, alpha_u8 = split_alpha(im)
            t0 = time.perf_counter()
            sr_u8 = np.asarray(upscale_fn(lr_u8))
            dt = time.perf_counter() - t0
            # alpha rides the bicubic path, not the GAN (image_io
            # docstring) — outputs are always PNG here, so it survives.
            # Kept OUTSIDE the timing window: the first alpha frame pays
            # a per-alpha-shape XLA compile that would otherwise inflate
            # the logged model throughput (ADVICE round 3).
            sr_u8 = merge_alpha(sr_u8, alpha_u8, scale)
            done[path] = sig2
            n += 1
            rec = {
                "frame": os.path.basename(path),
                "lr": list(lr_u8.shape[:2]),
                "sr": list(np.asarray(sr_u8).shape[:2]),
                "seconds": round(dt, 4),
                "mp_per_sec": round(
                    sr_u8.shape[0] * sr_u8.shape[1] / 1e6 / max(dt, 1e-9),
                    3),
            }
            if wq is not None:
                wq.put((dst, sr_u8, rec))
            else:
                _save_and_log(dst, sr_u8, rec)
            if max_frames is not None and n >= max_frames:
                return _flush(n)

        if werr:
            return _flush(n)                # re-raises the writer error
        if once:
            return _flush(n)
        time.sleep(poll_s)
