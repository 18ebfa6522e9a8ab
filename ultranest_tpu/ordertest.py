# noqa: D400 D205
"""
U test for uniform insertion ranks
----------------------------------

Online Mann-Whitney-Wilcoxon U test that nested sampling insertion ranks
are uniform — a statistical bias detector (cf. reference
ultranest/ordertest.py; method of Buchner 2023, sec. 4.5.2,
arxiv:2101.09675).

Pure scalar accumulator; negligible cost, stays on host.
"""

__all__ = ['infinite_U_zscore', 'UniformOrderAccumulator']


def infinite_U_zscore(sample, B):
    """MWW U-test z-score for *sample* of integers uniform between 0 and *B*.

    Parameters
    ----------
    sample: array of integers
        values between 0 and B (inclusive).
    B: int
        maximum rank allowed.

    Returns
    -------
    zscore: float
    """
    N = len(sample)
    return ((sample + 0.5).sum() - N * B * 0.5) / ((N / 12.0) ** 0.5 * B)


class UniformOrderAccumulator:
    """Streaming insertion-rank U-test accumulator.

    Stores only the running normalized rank sum, so the memory cost is O(1)
    regardless of run length.
    """

    def __init__(self):
        """Initiate empty accumulator."""
        self.N = 0
        self.U = 0.0

    def reset(self):
        """Set all counts to zero."""
        self.N = 0
        self.U = 0.0

    def add(self, order, N):
        """Accumulate rank *order* out of maximum rank *N* (inclusive)."""
        if not 0 <= order <= N:
            raise ValueError("order %d out of %d invalid" % (order, N))
        self.U += (order + 0.5) / N
        self.N += 1

    @property
    def zscore(self):
        """z-score against the uniform-rank null hypothesis."""
        if self.N == 0:
            return 0.0
        return (self.U - self.N * 0.5) / (self.N / 12.0) ** 0.5

    def __len__(self):
        """Return number of samples accumulated so far."""
        return self.N
