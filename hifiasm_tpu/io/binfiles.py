"""Checkpoint / resume: corrected reads + overlap dumps.

The reference's load-bearing resume contract (write_all_data_to_disk,
Overlaps.cpp:23567; loaded at Assembly.cpp:2062; `-i` ignores):
  prefix.ec.bin           corrected read sequences
  prefix.ovlp.source.bin  cis overlaps (paf)
  prefix.ovlp.reverse.bin trans overlaps (reverse_paf)

Same resume points, TPU-native container: one .npz per file
with columnar arrays (mmap-friendly, no struct-endianness issues).
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import numpy as np

from hifiasm_tpu.io.readstore import ReadStore
from hifiasm_tpu.overlap.paf import PafRecords, PafStore, _FIELDS
from hifiasm_tpu.utils.logging import log

MAGIC = "hifiasm-tpu-bin-v1"


def _save_arrays(path: str, **arrs) -> None:
    """Columnar container: JSON index + raw array bytes (np.savez's zip
    CRC pass costs ~0.5 s per bench checkpoint; raw tofile doesn't)."""
    import json

    meta = []
    for name, a in arrs.items():
        if isinstance(a, str):
            meta.append([name, "str", [len(a.encode())]])
        else:
            a = np.ascontiguousarray(a)
            meta.append([name, a.dtype.str, list(a.shape)])
    hdr = json.dumps(meta).encode()
    with open(path, "wb") as f:
        f.write(b"HTBIN1\n")
        f.write(len(hdr).to_bytes(8, "little"))
        f.write(hdr)
        for name, a in arrs.items():
            if isinstance(a, str):
                f.write(a.encode())
            else:
                np.ascontiguousarray(a).tofile(f)


def _load_arrays(path: str):
    """Load a _save_arrays container (or a legacy .npz) -> dict|None."""
    import json

    try:
        with open(path, "rb") as f:
            tag = f.read(7)
            if tag != b"HTBIN1\n":
                try:
                    z = np.load(path, allow_pickle=False)
                    return {k: z[k] for k in z.files}
                except Exception:
                    return None
            n = int.from_bytes(f.read(8), "little")
            meta = json.loads(f.read(n).decode())
            out = {}
            for name, dt, shape in meta:
                if dt == "str":
                    out[name] = f.read(shape[0]).decode()
                else:
                    cnt = int(np.prod(shape)) if shape else 1
                    a = np.fromfile(f, dtype=np.dtype(dt), count=cnt)
                    out[name] = a.reshape(shape)
            return out
    except Exception:
        return None


def write_reads(path: str, store: ReadStore) -> None:
    flat = np.concatenate([store.get_codes(i)
                           for i in range(store.n_reads)]) \
        if store.n_reads else np.zeros(0, np.uint8)
    _save_arrays(
        path, magic=MAGIC, names="\n".join(store.names),
        lens=store.lens, codes=flat, trio_flags=store.trio_flags)


def load_reads(path: str) -> Optional[ReadStore]:
    if not os.path.exists(path):
        return None
    z = _load_arrays(path)
    if z is None or str(z["magic"]) != MAGIC:
        return None
    names = str(z["names"]).split("\n") if z["lens"].size else []
    lens = z["lens"]
    flat = z["codes"]
    offs = np.concatenate([[0], np.cumsum(lens)])
    seqs = [flat[offs[i]:offs[i + 1]] for i in range(len(lens))]
    store = ReadStore.from_arrays(names, seqs)
    store.trio_flags = z["trio_flags"].copy()
    return store


def write_paf(path: str, paf: PafStore) -> None:
    qn, cols = paf.flatten()
    _save_arrays(path, magic=MAGIC, n_reads=np.array(len(paf)), qn=qn,
                 **{f: cols[f] for f in _FIELDS})


def load_paf(path: str) -> Optional[PafStore]:
    if not os.path.exists(path):
        return None
    z = _load_arrays(path)
    if z is None or str(z["magic"]) != MAGIC:
        return None
    n_reads = int(np.asarray(z["n_reads"]).reshape(()))
    qn = z["qn"]
    paf = PafStore(n_reads)
    if len(qn) == 0:
        return paf
    order = np.argsort(qn, kind="stable")
    cols = {f: z[f][order] for f in _FIELDS}
    qs = qn[order]
    bounds = np.flatnonzero(np.diff(qs)) + 1
    starts = np.concatenate([[0], bounds])
    ends = np.concatenate([bounds, [len(qs)]])
    for s, e in zip(starts, ends):
        rid = int(qs[s])
        paf[rid] = PafRecords(**{f: cols[f][s:e] for f in _FIELDS})
    return paf


def write_graph(path: str, sg, cov, r_to_u: np.ndarray) -> None:
    """String-graph checkpoint (~write_debug_graph, Overlaps.cpp:39436;
    --dbg-gfa lets the graph phase re-run standalone)."""
    _save_arrays(
        path, magic=MAGIC, n_seq=np.array(sg.n_seq), seq_len=sg.seq_len,
        seq_del=sg.seq_del, ul=sg.ul, v=sg.v, ol=sg.ol, strong=sg.strong,
        el=sg.el, no_l_indel=sg.no_l_indel, del_=sg.del_,
        cov_s=cov.s, cov_e=cov.e, cov_del=cov.del_, r_to_u=r_to_u)
    log("write_graph", f"wrote {path}")


def load_graph(path: str):
    """Returns (StringGraph, CoverageCut, r_to_u) or None."""
    from hifiasm_tpu.graph.sg import CoverageCut, StringGraph

    if not os.path.exists(path):
        return None
    z = _load_arrays(path)
    if z is None or str(z["magic"]) != MAGIC:
        return None
    sg = StringGraph(int(np.asarray(z["n_seq"]).reshape(())), z["seq_len"])
    sg.seq_del = z["seq_del"].copy()
    sg.set_arcs(z["ul"], z["v"], z["ol"], z["strong"], z["el"],
                z["no_l_indel"], z["del_"])
    cov = CoverageCut(z["cov_s"].copy(), z["cov_e"].copy(),
                      z["cov_del"].copy())
    return sg, cov, z["r_to_u"].copy()


def checkpoint_paths(prefix: str) -> Tuple[str, str, str]:
    return (f"{prefix}.ec.bin.npz", f"{prefix}.ovlp.source.bin.npz",
            f"{prefix}.ovlp.reverse.bin.npz")


def save_ec_state(prefix: str, store: ReadStore, paf: PafStore,
                  rev_paf: PafStore) -> None:
    d = os.path.dirname(prefix)
    if d:
        os.makedirs(d, exist_ok=True)
    p_ec, p_src, p_rev = checkpoint_paths(prefix)
    write_reads(p_ec, store)
    write_paf(p_src, paf)
    write_paf(p_rev, rev_paf)
    log("save_ec_state", f"wrote {p_ec} / {p_src} / {p_rev}")


def load_ec_state(prefix: str):
    """Returns (store, paf, rev_paf) or None (~load_all_data_from_disk)."""
    p_ec, p_src, p_rev = checkpoint_paths(prefix)
    store = load_reads(p_ec)
    if store is None:
        return None
    paf = load_paf(p_src)
    rev_paf = load_paf(p_rev)
    if paf is None or rev_paf is None or len(paf) != store.n_reads:
        return None
    log("load_ec_state", f"resumed from {p_ec} ({store.n_reads} reads, "
        f"{paf.total} + {rev_paf.total} overlaps)")
    return store, paf, rev_paf
