"""Core weighted FST structure and algorithms (numpy, host-side).

A minimal but correct WFST library in the log-probability semiring
(weights = natural-log probs; path weight = sum; set weight = logsumexp),
covering what the toolkit needs: composition with the epsilon-sequencing
filter, epsilon removal, connection (trimming), and (de)serialization,
including reading OpenFST text format for interop.

This replaces the reference's use of OpenFST
(/root/reference/src/ctc_crf/gpu_den/fst_read.cc:45-62 reads a StdVectorFst
and negates tropical weights into log-probs — the same convention used
natively here).
"""
from __future__ import annotations

import io
from dataclasses import dataclass, field

import numpy as np

NEG_INF = -1e30
EPS = 0  # epsilon label id (OpenFST convention)


def logaddexp(a, b):
    if a <= NEG_INF / 2:
        return b
    if b <= NEG_INF / 2:
        return a
    m = max(a, b)
    return m + np.log(np.exp(a - m) + np.exp(b - m))


@dataclass
class Fst:
    """Mutable WFST. Arcs: (src, dst, ilabel, olabel) int32 + weight f64."""

    num_states: int = 0
    start: int = -1
    arcs: list = field(default_factory=list)  # (src, dst, il, ol, w)
    finals: dict = field(default_factory=dict)  # state -> log-prob weight

    def add_state(self) -> int:
        self.num_states += 1
        return self.num_states - 1

    def add_arc(self, src, dst, ilabel, olabel, weight=0.0):
        self.arcs.append((src, dst, ilabel, olabel, float(weight)))

    def set_final(self, state, weight=0.0):
        self.finals[state] = float(weight)

    @property
    def num_arcs(self):
        return len(self.arcs)

    def arcs_by_state(self):
        out = [[] for _ in range(self.num_states)]
        for a in self.arcs:
            out[a[0]].append(a)
        return out

    def arrays(self):
        """Dense numpy views: (src, dst, il, ol) int32 (A,4), w f32 (A,)."""
        if not self.arcs:
            return (np.zeros((0, 4), np.int32), np.zeros((0,), np.float32))
        arr = np.asarray([(a[0], a[1], a[2], a[3]) for a in self.arcs],
                         np.int32)
        w = np.asarray([a[4] for a in self.arcs], np.float32)
        return arr, w

    def final_array(self):
        f = np.full((self.num_states,), NEG_INF, np.float32)
        for s, w in self.finals.items():
            f[s] = w
        return f

    # ---------------- serialization ----------------

    def write_text(self, fileobj):
        """OpenFST-style text format, weights written as -logprob
        (tropical convention) for interop with fstcompile."""
        close = False
        if isinstance(fileobj, str):
            fileobj = open(fileobj, "w")
            close = True
        for src, dst, il, ol, w in self.arcs:
            fileobj.write(f"{src}\t{dst}\t{il}\t{ol}\t{-w:.6f}\n")
        for s, w in sorted(self.finals.items()):
            fileobj.write(f"{s}\t{-w:.6f}\n")
        if close:
            fileobj.close()

    @classmethod
    def read_text(cls, fileobj, negate_weights=True):
        """Read OpenFST text format. Tropical weights are negated into
        log-probs by default (mirrors fst_read.cc:49-57)."""
        close = False
        if isinstance(fileobj, str):
            fileobj = open(fileobj)
            close = True
        fst = cls()
        max_state = -1
        for line in fileobj:
            parts = line.split()
            if not parts:
                continue
            if len(parts) >= 4:
                src, dst, il, ol = map(int, parts[:4])
                w = float(parts[4]) if len(parts) > 4 else 0.0
                if negate_weights:
                    w = -w
                fst.arcs.append((src, dst, il, ol, w))
                max_state = max(max_state, src, dst)
                if fst.start < 0:
                    fst.start = src
            else:
                s = int(parts[0])
                w = float(parts[1]) if len(parts) > 1 else 0.0
                if negate_weights:
                    w = -w
                fst.finals[s] = w
                max_state = max(max_state, s)
        fst.num_states = max_state + 1
        if close:
            fileobj.close()
        return fst

    def save(self, path):
        arr, w = self.arrays()
        np.savez(path, arcs=arr, weights=w, start=np.int32(self.start),
                 num_states=np.int32(self.num_states),
                 final_states=np.asarray(sorted(self.finals), np.int32),
                 final_weights=np.asarray(
                     [self.finals[s] for s in sorted(self.finals)],
                     np.float32))

    @classmethod
    def load(cls, path):
        z = np.load(path)
        fst = cls(num_states=int(z["num_states"]), start=int(z["start"]))
        arr, w = z["arcs"], z["weights"]
        fst.arcs = [(int(a[0]), int(a[1]), int(a[2]), int(a[3]), float(x))
                    for a, x in zip(arr, w)]
        fst.finals = {int(s): float(x) for s, x in
                      zip(z["final_states"], z["final_weights"])}
        return fst


def connect(fst: Fst) -> Fst:
    """Trim states not both accessible from start and co-accessible."""
    fwd = [[] for _ in range(fst.num_states)]
    bwd = [[] for _ in range(fst.num_states)]
    for src, dst, *_ in fst.arcs:
        fwd[src].append(dst)
        bwd[dst].append(src)

    def reach(starts, adj):
        seen = set(starts)
        stack = list(starts)
        while stack:
            s = stack.pop()
            for d in adj[s]:
                if d not in seen:
                    seen.add(d)
                    stack.append(d)
        return seen

    if fst.start < 0:
        return Fst()
    acc = reach([fst.start], fwd)
    coacc = reach([s for s in fst.finals if s in acc], bwd)
    keep = acc & coacc
    remap = {}
    out = Fst()
    for s in sorted(keep):
        remap[s] = out.add_state()
    if fst.start not in remap:
        return Fst()
    out.start = remap[fst.start]
    for src, dst, il, ol, w in fst.arcs:
        if src in remap and dst in remap:
            out.add_arc(remap[src], remap[dst], il, ol, w)
    for s, w in fst.finals.items():
        if s in remap:
            out.set_final(remap[s], w)
    return out


def compose(fst1: Fst, fst2: Fst) -> Fst:
    """Compose with the epsilon-sequencing filter (3 filter states), so
    epsilon interleavings are not double-counted — essential in the
    probability semiring (the denominator mass must be exact)."""
    out = Fst()
    arcs2_by_state: list[dict] = [dict() for _ in range(fst2.num_states)]
    eps2_by_state: list[list] = [[] for _ in range(fst2.num_states)]
    for a in fst2.arcs:
        src, dst, il, ol, w = a
        if il == EPS:
            eps2_by_state[src].append(a)
        else:
            arcs2_by_state[src].setdefault(il, []).append(a)
    arcs1_by_state = [[] for _ in range(fst1.num_states)]
    for a in fst1.arcs:
        arcs1_by_state[a[0]].append(a)

    state_map = {}

    def get_state(q1, q2, f):
        key = (q1, q2, f)
        if key not in state_map:
            state_map[key] = out.add_state()
            queue.append(key)
        return state_map[key]

    queue = []
    out.start = get_state(fst1.start, fst2.start, 0)
    qi = 0
    while qi < len(queue):
        q1, q2, f = queue[qi]
        sid = state_map[(q1, q2, f)]
        qi += 1
        # final weight
        if q1 in fst1.finals and q2 in fst2.finals:
            out.set_final(sid, fst1.finals[q1] + fst2.finals[q2])
        # Mohri's epsilon-sequencing filter:
        #   f=0: match, eps1-alone (->1), eps2-alone (->2), both (->0)
        #   f=1: match (->0), eps1-alone (->1)
        #   f=2: match (->0), eps2-alone (->2)
        for src1, dst1, il1, ol1, w1 in arcs1_by_state[q1]:
            if ol1 == EPS:
                # eps1-alone: advance fst1 only.
                if f != 2:
                    out.add_arc(sid, get_state(dst1, q2, 1), il1, EPS, w1)
                # simultaneous eps1+eps2 (only from filter state 0).
                if f == 0:
                    for _, dst2, _, ol2, w2 in eps2_by_state[q2]:
                        out.add_arc(sid, get_state(dst1, dst2, 0), il1,
                                    ol2, w1 + w2)
                continue
            for src2, dst2, il2, ol2, w2 in arcs2_by_state[q2].get(ol1, []):
                out.add_arc(sid, get_state(dst1, dst2, 0), il1, ol2, w1 + w2)
        # eps2-alone: advance fst2 only.
        if f != 1:
            for src2, dst2, il2, ol2, w2 in eps2_by_state[q2]:
                out.add_arc(sid, get_state(q1, dst2, 2), EPS, ol2, w2)
    return connect(out)


def rm_epsilon(fst: Fst) -> Fst:
    """Remove input-epsilon arcs (weight-correct, requires an acyclic
    epsilon subgraph — true for backoff-LM compositions where epsilon
    arcs only move to lower n-gram orders)."""
    eps_adj = [[] for _ in range(fst.num_states)]
    for src, dst, il, ol, w in fst.arcs:
        if il == EPS:
            eps_adj[src].append((dst, w))

    # epsilon closure with logsumexp-combined weights, memoized DFS
    closure_cache: dict[int, dict[int, float]] = {}
    visiting = set()

    def closure(s) -> dict[int, float]:
        if s in closure_cache:
            return closure_cache[s]
        if s in visiting:
            raise ValueError("epsilon cycle detected; rm_epsilon requires "
                             "an acyclic epsilon subgraph")
        visiting.add(s)
        res = {s: 0.0}
        for dst, w in eps_adj[s]:
            for r, rw in closure(dst).items():
                tot = w + rw
                res[r] = logaddexp(res.get(r, NEG_INF), tot)
        visiting.discard(s)
        closure_cache[s] = res
        return res

    out = Fst(num_states=fst.num_states, start=fst.start)
    non_eps_by_state = [[] for _ in range(fst.num_states)]
    for a in fst.arcs:
        if a[2] != EPS:
            non_eps_by_state[a[0]].append(a)
    for s in range(fst.num_states):
        cl = closure(s)
        fin = NEG_INF
        for r, cw in cl.items():
            for _, dst, il, ol, w in non_eps_by_state[r]:
                out.add_arc(s, dst, il, ol, cw + w)
            if r in fst.finals:
                fin = logaddexp(fin, cw + fst.finals[r])
        if fin > NEG_INF / 2:
            out.set_final(s, fin)
    return connect(out)
