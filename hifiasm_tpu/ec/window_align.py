"""Windowed overlap alignment for error correction.

Re-expresses ``gen_hc_r_alin_ea`` (ecovlp.cpp:2810): each overlap region is
sliced into windows of ``wl`` (WINDOW_HC = 775 for HiFi) on the query; the
matching target slice is located from the chain hits (the reference
interpolates its "fake cigar" gap-shift checkpoints, Hash_Table.h:71-76);
each window is aligned by banded bit-parallel Myers with error budget
``ceil(wlen * e_rate)`` capped at THRESHOLD_MAX_SIZE = 31, retrying failed
windows once with a doubled band (the reference's double_error_threshold
retry in Correct.cpp's verify_window flow).

TPU-first shape: windows from ALL reads of a batch are flattened into large
fixed-shape launches (``WindowBatcher``) instead of the reference's
one-window-at-a-time SSE calls.  The engine is pluggable: the numpy oracle
(ops/banded_batch.py) or the jitted JAX scan (ops/banded_align_jax.py).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Dict, List, Optional

import numpy as np

from hifiasm_tpu.config import THRESHOLD_MAX_SIZE, WINDOW_HC
from hifiasm_tpu.ops.banded_batch import banded_batch_np
from hifiasm_tpu.overlap.anchors import OverlapRegions

Engine = Callable[..., "BatchAlign"]  # (x, xlen, y, ylen, e) -> BatchAlign


def resolve_engine(name: str = "auto") -> Engine:
    """auto -> device engine on TPU backends; native C++ then numpy on
    CPU."""
    if name == "numpy":
        return banded_batch_np
    if name == "jax":
        from hifiasm_tpu.ops.banded_align_jax import banded_batch_jax
        return banded_batch_jax
    if name == "native":
        from hifiasm_tpu.native import banded_batch_native, get_lib
        if get_lib() is None:
            raise RuntimeError("native engine unavailable (build failed)")
        return banded_batch_native
    try:
        import jax
        if jax.default_backend() not in ("cpu",):
            from hifiasm_tpu.ops.banded_align_jax import banded_batch_jax
            return banded_batch_jax
    except Exception:
        pass
    try:
        from hifiasm_tpu.native import get_lib, banded_batch_native
        if get_lib() is not None:
            return banded_batch_native
    except Exception:
        pass
    return banded_batch_np


@dataclass
class OverlapTracebacks:
    """Per-overlap windowed alignment results, positions in CSR layout.

    Position arrays cover each overlap's query range [x_s, x_e] inclusive;
    ``off[o] + (p - x_s[o])`` indexes query position p of overlap o.
    """

    off: np.ndarray        # [n_ov + 1] int64
    tb: np.ndarray         # flat uint8: 0..3 target base, 4 del, 5 unaligned
    ins_cnt: np.ndarray    # flat uint8
    ins_base: np.ndarray   # flat uint8
    win_tot: np.ndarray    # [n_ov] int32
    win_ok: np.ndarray     # [n_ov] int32
    err: np.ndarray        # [n_ov] int64 total errors over aligned windows
    ts: np.ndarray         # [n_ov] int64 precise target start (query frame)
    te: np.ndarray         # [n_ov] int64 precise target end (incl., query frame)
    x_s: np.ndarray = None  # [n_ov] int64 query start of each overlap

    def fully_aligned(self) -> np.ndarray:
        return (self.win_tot > 0) & (self.win_ok == self.win_tot)

    def view(self, o: int, field: str) -> np.ndarray:
        a = getattr(self, field)
        return a[self.off[o]:self.off[o + 1]]


def _window_threshold(wlen: int, e_rate: float) -> int:
    t = int(np.ceil(wlen * e_rate))
    return max(2, min(t, THRESHOLD_MAX_SIZE))


def plan_read_windows(ov: OverlapRegions, wl: int, e_rate: float):
    """Window coordinates for every overlap of one read.

    Returns dict of arrays: ov_idx, ws (query window start), wlen, t_ws
    (target window nominal start, query frame), thre (per-window error
    budget), last (final window of its overlap).  Shared by the host
    WindowBatcher and the device-resident EC planner.
    """
    o_l, ws_l, wlen_l, tws_l, thre_l, last_l = [], [], [], [], [], []
    for o in range(len(ov)):
        xs, xe = int(ov.x_s[o]), int(ov.x_e[o])
        hs = ov.hit_self[ov.hit_start[o]:ov.hit_start[o] + ov.n_hits[o]]
        ht = ov.hit_t[ov.hit_start[o]:ov.hit_start[o] + ov.n_hits[o]]
        ws = xs
        while ws <= xe:
            wlen = min(wl, xe - ws + 1)
            # nearest chain hit at-or-after the window start (anchor
            # offsets are k-mer ENDS, so a hit >= ws constrains it best)
            hi = min(int(np.searchsorted(hs, ws)), len(hs) - 1)
            t_ws = int(ht[hi]) + (ws - int(hs[hi]))
            o_l.append(o)
            ws_l.append(ws)
            wlen_l.append(wlen)
            tws_l.append(t_ws)
            thre_l.append(_window_threshold(wlen, e_rate))
            last_l.append(ws + wlen > xe)
            ws += wlen
    return dict(ov_idx=np.array(o_l, np.int64),
                ws=np.array(ws_l, np.int64),
                wlen=np.array(wlen_l, np.int64),
                t_ws=np.array(tws_l, np.int64),
                thre=np.array(thre_l, np.int64),
                last=np.array(last_l, bool))


def _alloc_tracebacks(ov: OverlapRegions) -> OverlapTracebacks:
    n_ov = len(ov)
    spans = (ov.x_e - ov.x_s + 1) if n_ov else np.zeros(0, np.int64)
    off = np.concatenate([[0], np.cumsum(spans)]).astype(np.int64)
    total = int(off[-1])
    return OverlapTracebacks(
        off=off,
        tb=np.full(total, 5, np.uint8),
        ins_cnt=np.zeros(total, np.uint8),
        ins_base=np.zeros(total, np.uint8),
        win_tot=np.zeros(n_ov, np.int32),
        win_ok=np.zeros(n_ov, np.int32),
        err=np.zeros(n_ov, np.int64),
        ts=ov.y_s.copy() if n_ov else np.zeros(0, np.int64),
        te=ov.y_e.copy() if n_ov else np.zeros(0, np.int64),
        x_s=ov.x_s.astype(np.int64).copy() if n_ov else np.zeros(0, np.int64),
    )


class WindowBatcher:
    """Accumulates window jobs across many reads, runs them in large
    fixed-shape batches, scatters results back into per-read tracebacks."""

    def __init__(self, get_target: Callable[[int, int], np.ndarray],
                 e_rate: float, wl: int = WINDOW_HC,
                 engine: Optional[Engine] = None, chunk: int = 4096):
        self.get_target = get_target
        self.e_rate = e_rate
        self.wl = wl
        self.engine = engine or banded_batch_np
        self.chunk = chunk
        self._jobs_x: List[np.ndarray] = []     # query window codes
        self._jobs_tkey: List[int] = []         # (tid << 1) | rev
        self._jobs_tws: List[int] = []          # target window anchor start
        self._jobs_thre: List[int] = []
        self._jobs_last: List[bool] = []        # final window of its overlap
        self._jobs_dst: List[tuple] = []        # (tbs, ov_idx, ws)

    def add_read(self, q: np.ndarray, ov: OverlapRegions
                 ) -> OverlapTracebacks:
        """Plan all windows of one read's overlaps; returns the (empty)
        traceback container that flush() will fill."""
        tbs = _alloc_tracebacks(ov)
        for o in range(len(ov)):
            xs, xe = int(ov.x_s[o]), int(ov.x_e[o])
            hs = ov.hit_self[ov.hit_start[o]:ov.hit_start[o] + ov.n_hits[o]]
            ht = ov.hit_t[ov.hit_start[o]:ov.hit_start[o] + ov.n_hits[o]]
            tkey = (int(ov.y_id[o]) << 1) | int(ov.rev[o])
            ws = xs
            n_win = 0
            while ws <= xe:
                wlen = min(self.wl, xe - ws + 1)
                # nearest chain hit at-or-after the window start (anchor
                # offsets are k-mer ENDS, so a hit >= ws constrains it best)
                hi = min(int(np.searchsorted(hs, ws)), len(hs) - 1)
                t_ws = int(ht[hi]) + (ws - int(hs[hi]))
                self._jobs_x.append(q[ws:ws + wlen])
                self._jobs_tkey.append(tkey)
                self._jobs_tws.append(t_ws)
                self._jobs_thre.append(_window_threshold(wlen, self.e_rate))
                self._jobs_last.append(ws + wlen > xe)
                self._jobs_dst.append((tbs, o, ws))
                n_win += 1
                ws += wlen
            tbs.win_tot[o] = n_win
        return tbs

    def flush(self) -> None:
        """Run all planned windows in fixed-shape chunks.

        Every window is aligned with the FULL band (e = 31, one compiled
        kernel shape) and accepted when err <= min(2*thre, 31) — the wide
        band costs nothing extra on device, and the doubled acceptance
        reproduces what the reference reaches via its double-threshold
        retry realignment (Correct.cpp verify_window flow)."""
        n = len(self._jobs_x)
        if n == 0:
            return
        win_y = np.zeros((n, 2), np.int64)
        win_acc = np.zeros(n, bool)
        sel_all = np.arange(n)
        for c0 in range(0, n, self.chunk):
            self._run(sel_all[c0:c0 + self.chunk], THRESHOLD_MAX_SIZE,
                      win_acc, win_y)
        # precise per-overlap target range from first/last aligned window
        # (global y-start can be slightly negative when the alignment
        # consumed a virtual front pad -> clamp, don't skip)
        seen = {}
        for w, (tbs, o, ws) in enumerate(self._jobs_dst):
            if not win_acc[w]:
                continue
            key = (id(tbs), o)
            if key not in seen:
                tbs.ts[o] = max(win_y[w, 0], 0)
                seen[key] = True
            tbs.te[o] = win_y[w, 1] - 1
        self._jobs_x.clear()
        self._jobs_tkey.clear()
        self._jobs_tws.clear()
        self._jobs_thre.clear()
        self._jobs_last.clear()
        self._jobs_dst.clear()

    def _run(self, sel: np.ndarray, thre: int, win_acc: np.ndarray,
             win_y: np.ndarray) -> None:
        B = len(sel)
        XL = self.wl
        YL = XL + 2 * thre
        xb = np.full((B, XL), 4, np.uint8)
        yb = np.full((B, YL), 4, np.uint8)
        xlen = np.zeros(B, np.int64)
        ylen = np.zeros(B, np.int64)
        y0 = np.zeros(B, np.int64)
        for bi, w in enumerate(sel):
            xw = self._jobs_x[w]
            xb[bi, :len(xw)] = xw
            xlen[bi] = len(xw)
            t = self.get_target(self._jobs_tkey[w] >> 1,
                                self._jobs_tkey[w] & 1)
            # the band at x position i covers y in [i, i+2e] of the window,
            # so the window MUST begin thre before the nominal start or the
            # deletion half of the band is lost; out-of-target positions
            # stay sentinel 4 (never match) -- virtual padding
            y0v = self._jobs_tws[w] - thre
            src_lo = max(0, y0v)
            src_hi = min(len(t), y0v + len(xw) + 2 * thre)
            if src_hi <= src_lo:
                continue
            yb[bi, src_lo - y0v:src_hi - y0v] = t[src_lo:src_hi]
            ylen[bi] = src_hi - y0v
            y0[bi] = y0v
            # suffix overlap: the target can run out before the final x
            # window does (indel drift past the last anchor) — the banded
            # engine needs ylen >= xlen, so clamp the tail window's x
            if self._jobs_last[w] and ylen[bi] < xlen[bi]:
                xlen[bi] = ylen[bi]
        out = self.engine(xb, xlen, yb, ylen, thre)
        accept_thre = np.minimum(
            np.asarray([self._jobs_thre[w] for w in sel]) * 2,
            THRESHOLD_MAX_SIZE)
        good = (out.err >= 0) & (out.err <= accept_thre)
        for bi in np.flatnonzero(good):
            w = int(sel[bi])
            tbs, o, ws = self._jobs_dst[w]
            wlen = int(xlen[bi])
            d0 = int(tbs.off[o]) + ws - int(tbs.x_s[o])
            dst = slice(d0, d0 + wlen)
            tbs.tb[dst] = out.tb_base[bi, :wlen]
            tbs.ins_cnt[dst] = out.ins_cnt[bi, :wlen]
            tbs.ins_base[dst] = out.ins_base[bi, :wlen]
            tbs.err[o] += int(out.err[bi])
            tbs.win_ok[o] += 1
            win_y[w, 0] = int(y0[bi]) + int(out.y_start[bi])
            win_y[w, 1] = int(y0[bi]) + int(out.y_end[bi])
            win_acc[w] = True


def align_overlaps(q: np.ndarray, ov: OverlapRegions,
                   get_target: Callable[[int, int], np.ndarray],
                   e_rate: float, wl: int = WINDOW_HC,
                   engine: Optional[Engine] = None) -> OverlapTracebacks:
    """Single-read convenience wrapper around WindowBatcher."""
    wb = WindowBatcher(get_target, e_rate, wl, engine=engine)
    tbs = wb.add_read(q, ov)
    wb.flush()
    return tbs
