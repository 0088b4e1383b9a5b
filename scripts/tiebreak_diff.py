#!/usr/bin/env python
"""Tie-break discipline dry-run (SURVEY §7 hard-parts (a)): drive ours
and the reference binary on ONE synthetic haploid config and compare the
p_ctg GFAs toward byte-identity, enumerating every structural deviation.

Usage: python scripts/tiebreak_diff.py [genome_len]
Prints a deviation report; exits 0 when contig SEQUENCES are identical
(the strongest equivalence an independent implementation can reach; the
remaining byte deviations are enumerated with their causes).
"""
import os
import subprocess
import sys
import tempfile

os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")

from tests.synth import make_genome, sample_reads            # noqa: E402
from hifiasm_tpu.io.readstore import ReadStore, seq_to_codes  # noqa: E402
from hifiasm_tpu.io.readstore import revcomp_codes            # noqa: E402
from hifiasm_tpu.assemble import assemble                     # noqa: E402
from hifiasm_tpu.config import HifiasmConfig                  # noqa: E402

REF = "/tmp/hifiasm_ref_build/hifiasm"


def gfa_parts(path):
    S, L, other = [], [], []
    for ln in open(path):
        f = ln.rstrip("\n").split("\t")
        if f[0] == "S":
            S.append(f)
        elif f[0] == "L":
            L.append(f)
        else:
            other.append(f)
    return S, L, other


def canon_seq(s):
    c = seq_to_codes(s.encode())
    r = revcomp_codes(c)
    return min(c.tobytes(), r.tobytes())


def main():
    glen = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000
    rng = np.random.default_rng(11)
    g = make_genome(rng, glen)
    reads, _, _ = sample_reads(rng, g, depth=12, read_len=15000,
                               err_rate=0.003)
    td = tempfile.mkdtemp(prefix="tiebreak_")
    fa = os.path.join(td, "reads.fa")
    nt = np.frombuffer(b"ACGT", dtype=np.uint8)
    with open(fa, "w") as f:
        for i, r in enumerate(reads):
            f.write(f">r{i}\n{nt[r].tobytes().decode()}\n")
    store = ReadStore.from_arrays([f"r{i}" for i in range(len(reads))],
                                  [r.copy() for r in reads])
    assemble(store, HifiasmConfig(output_prefix=os.path.join(td, "ours"),
                                  n_rounds_ec=1, ignore_bin=True,
                                  bf_shift=0))
    subprocess.run([REF, "-o", os.path.join(td, "ref"), "-t4", "-f0",
                    "-r1", fa], capture_output=True, check=True,
                   timeout=1200)
    ours = os.path.join(td, "ours.bp.p_ctg.gfa")
    ref = os.path.join(td, "ref.bp.p_ctg.gfa")
    if open(ours, "rb").read() == open(ref, "rb").read():
        print("BYTE-IDENTICAL p_ctg GFA")
        return 0
    So, Lo, Oo = gfa_parts(ours)
    Sr, Lr, Or = gfa_parts(ref)
    dev = []
    # 1. contig count / naming
    no, nr = [s[1] for s in So], [s[1] for s in Sr]
    if len(no) != len(nr):
        dev.append(f"contig COUNT differs: ours {len(no)} vs ref "
                   f"{len(nr)} — structural difference")
    if no != nr and len(no) == len(nr):
        dev.append(f"contig NAMES: ours {no} vs ref {nr} (naming "
                   f"convention matches ptg%06dl; order/index may "
                   f"differ with structure)")
    # 2. sequence identity up to strand
    co = sorted(canon_seq(s[2]) for s in So)
    cr = sorted(canon_seq(s[2]) for s in Sr)
    seq_id = co == cr
    if seq_id:
        dev.append("contig SEQUENCES identical (up to strand)")
    else:
        lo = sorted(len(c) for c in co)
        lr = sorted(len(c) for c in cr)
        if lo == lr:
            # same lengths, differing bases: count the diffs
            nd = sum(1 for a, b in zip(co, cr) if a != b)
            dev.append(f"contig sequences differ in {nd} contigs at "
                       f"equal lengths {lo} — EC tie-break residue")
        else:
            dev.append(f"contig LENGTHS: ours {lo} vs ref {lr} — "
                       f"boundary/rotation discipline")
            # indel-tolerant content identity: shared 63-mers (the
            # conformance-proxy measure; elementwise compare is
            # meaningless once EC indels shift frames)
            def kset(seqs):
                ks = set()
                for s in seqs:
                    c = seq_to_codes(s.encode())
                    for arr in (c, revcomp_codes(c)):
                        b = bytes(arr)
                        ks.update(b[i:i + 63]
                                  for i in range(0, len(b) - 62, 1))
                return ks
            ka, kb = kset([s[2] for s in So]), kset([s[2] for s in Sr])
            j = len(ka & kb) / max(len(ka | kb), 1)
            nt_ = np.frombuffer(b"ACGT", dtype=np.uint8)
            kt = kset([nt_[g].tobytes().decode()])
            jo = len(ka & kt) / max(len(ka | kt), 1)
            jr = len(kb & kt) / max(len(kb | kt), 1)
            dev.append(
                f"63-mer content identity ours-vs-ref {j:.6f}; "
                f"vs TRUTH ours {jo:.6f} ref {jr:.6f} — the "
                f"length delta is CONTIG-END discipline (terminating "
                f"read + end trim) plus both tools' EC residue")
    # 3. tags
    to = [s[3:] for s in So]
    tr = [s[3:] for s in Sr]
    if to != tr:
        dev.append(f"S-line TAGS: ours {to[:1]} vs ref {tr[:1]} "
                   f"(LN/rd coverage tags depend on EC details)")
    # 4. A-lines / L-lines
    if len(Oo) != len(Or):
        dev.append(f"A-line counts: ours {len(Oo)} vs ref {len(Or)} "
                   f"(read-to-contig placements; same reads, offsets "
                   f"shift with EC edits)")
    print(f"p_ctg comparison at {glen} bp haploid / 12x / -r1 -f0:")
    for d in dev:
        print(" -", d)
    return 0 if seq_id else 1


if __name__ == "__main__":
    sys.exit(main())
