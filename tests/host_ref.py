"""Independent host-side golden model of the reference semantics.

A deliberately simple, slow, pure-Python FM-index implementing the
*behavior* specified by seqindex.c / single_align.c — used to
differential-test the batched device ops on small random inputs.
Written from the spec, not translated from the C.
"""

from __future__ import annotations

import numpy as np


class HostFMI:
    def __init__(self, codes):
        codes = list(int(c) for c in codes)
        n = len(codes)
        self.n = n
        self.seq = codes
        # suffix array over codes + sentinel (sentinel smallest)
        ext = codes + [-1]
        self.sa = sorted(range(n + 1), key=lambda i: ext[i:])
        # compact bwt (sentinel skipped), endloc
        self.bwt = []
        self.endloc = None
        for pos, s in enumerate(self.sa):
            if s == 0:
                self.endloc = pos
            else:
                self.bwt.append(codes[s - 1])
        counts = [self.bwt.count(c) for c in range(4)]
        self.C = [1]
        for c in range(4):
            self.C.append(self.C[-1] + counts[c])
        self.sa_samples = [self.sa[i] for i in range(0, n + 1, 32)]

    # -- core queries ----------------------------------------------------

    def rank(self, c, idx):
        if idx > self.endloc:
            idx -= 1
        return sum(1 for x in self.bwt[:idx] if x == c)

    def lf(self, idx):
        if idx == self.endloc:
            return 0
        c = self.bwt[idx - 1 if idx > self.endloc else idx]
        return self.C[c] + self.rank(c, idx)

    def unc_sa(self, idx):
        i = 0
        while idx & 31:
            idx = self.lf(idx)
            i += 1
        x = self.sa_samples[idx // 32] + i
        if x > self.n:
            x -= self.n + 1
        return x

    def reverse_search(self, pattern):
        length = len(pattern)
        start = self.C[pattern[-1]]
        end = self.C[pattern[-1] + 1]
        for i in range(length - 2, -1, -1):
            if end <= start:
                return 0
            c = pattern[i]
            start = self.C[c] + self.rank(c, start)
            end = self.C[c] + self.rank(c, end)
        return end - start + 1  # reference quirk (seqindex.c:241)

    def locate(self, pattern):
        length = len(pattern)
        start = self.C[pattern[-1]]
        end = self.C[pattern[-1] + 1]
        for i in range(length - 2, -1, -1):
            if end <= start:
                return -1
            c = pattern[i]
            start = self.C[c] + self.rank(c, start)
            end = self.C[c] + self.rank(c, end)
        return self.unc_sa(start)

    def mms(self, pattern):
        """Returns (matched, sp, ep) per seqindex.c:314-351."""
        pattern = list(pattern)
        length = len(pattern)
        skips = 0
        while length > 0 and pattern[length - 1] == 5:
            length -= 1
            skips += 1
        sp = start = self.C[pattern[length - 1]]
        ep = end = self.C[pattern[length - 1] + 1]
        i = length - 2
        while i >= 0:
            if end <= start:
                break
            sp, ep = start, end
            c = pattern[i]
            if c == 5:
                best, mx = 0, -1
                for d in range(4):
                    cnt = self.rank(d, end) - self.rank(d, start)
                    if cnt > mx:
                        mx, best = cnt, d
                c = best
            start = self.C[c] + self.rank(c, start)
            end = self.C[c] + self.rank(c, end)
            i -= 1
        if end <= start:
            return length - i - 2 + skips, sp, ep
        return length - i - 1 + skips, start, end

    def mms_continue(self, pattern, length, sp, ep):
        """single_align.c:26-46 semantics."""
        start, end = sp, ep
        i = length - 1
        while i >= 0:
            if end <= start:
                break
            sp, ep = start, end
            c = pattern[i]
            if c == 5:
                best, mx = 0, -1
                for d in range(4):
                    cnt = self.rank(d, end) - self.rank(d, start)
                    if cnt > mx:
                        mx, best = cnt, d
                c = best
            start = self.C[c] + self.rank(c, start)
            end = self.C[c] + self.rank(c, end)
            i -= 1
        if end <= start:
            return length - i - 2, sp, ep
        return length - i - 1, start, end


def random_codes(rng, n):
    return rng.integers(0, 4, size=n).astype(np.uint8)
