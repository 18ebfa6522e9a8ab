# noqa: D400 D205
"""
Point storage for checkpointing and resume
------------------------------------------

Append-only log of every evaluated point, as rows
``[Lmin, L, quality, u..., p...]``. Resuming replays rows via
:meth:`FilePointStore.pop`: the first stored row with
``row_Lmin <= Lmin < L`` substitutes a likelihood evaluation — the exact
matching rule resume correctness depends on (cf. reference
`/root/reference/ultranest/store.py:75-106`).

Backends: HDF5 (recommended), text (tsv/csv), or null.
"""

import contextlib
import os
import warnings

import numpy as np

__all__ = ['NullPointStore', 'TextPointStore', 'HDF5PointStore']


class NullPointStore:
    """No storage; counts rows only."""

    def __init__(self, ncols):
        """Initialise mock store with *ncols* columns."""
        self.ncols = int(ncols)
        self.nrows = 0
        self.stack_empty = True
        self.ncalls = 0

    def reset(self):
        """Do nothing."""
        pass

    def close(self):
        """Do nothing."""
        pass

    def flush(self):
        """Do nothing."""
        pass

    def add(self, row, ncalls):
        """Count a row; no storage."""
        self.nrows += 1
        self.ncalls = ncalls
        return self.nrows - 1

    def pop(self, Lmin):
        """Return no point (None, None)."""
        return None, None


class FilePointStore:
    """Shared stack/replay logic for file-backed stores."""

    def reset(self):
        """Refresh the stack-empty flag (keeps remaining rows replayable)."""
        self.stack_empty = len(self.stack) == 0

    def close(self):
        """Close the file object."""
        self.fileobj.close()

    def flush(self):
        """Flush the file object to disk."""
        self.fileobj.flush()

    def pop(self, Lmin):
        """Return the first stored point drawn from <= *Lmin* with L > *Lmin*.

        Returns (index, row) or (None, None) if no stored row matches.
        """
        if self.stack_empty:
            return None, None
        for i, (idx, next_row) in enumerate(self.stack):
            row_Lmin = next_row[0]
            L = next_row[1]
            if row_Lmin <= Lmin and L > Lmin:
                idx, row = self.stack.pop(i)
                self.stack_empty = len(self.stack) == 0
                return idx, row
        self.stack_empty = len(self.stack) == 0
        return None, None


class TextPointStore(FilePointStore):
    """Tab/comma separated text file storage.

    The ``fmt`` and ``delimiter`` attributes control the output format.
    """

    def __init__(self, filepath, ncols):
        """Load and append to storage at *filepath* with *ncols* columns."""
        self.ncols = int(ncols)
        self.nrows = 0
        self.stack_empty = True
        self._load(filepath)
        self.fileobj = open(filepath, 'ab')  # noqa: SIM115
        self.fmt = '%.18e'
        self.delimiter = '\t'

    def _load(self, filepath):
        stack = []
        if os.path.exists(filepath):
            with contextlib.suppress(IOError), open(filepath) as f:
                for line in f:
                    try:
                        parts = [float(p) for p in line.split()]
                        if len(parts) != self.ncols:
                            warnings.warn(
                                "skipping lines in '%s' with different "
                                "number of columns" % filepath, stacklevel=3)
                            continue
                        stack.append(parts)
                    except ValueError:
                        warnings.warn(
                            "skipping unparsable line in '%s'" % filepath,
                            stacklevel=3)
        self.stack = list(enumerate(stack))
        self.ncalls = len(self.stack)
        self.reset()

    def add(self, row, ncalls):
        r"""Append row = [Lmin, L, \*otherinfo]; returns its index."""
        if len(row) != self.ncols:
            raise ValueError("expected %d values, got %d in %s"
                             % (self.ncols, len(row), row))
        np.savetxt(self.fileobj, [row], fmt=self.fmt, delimiter=self.delimiter)
        self.nrows += 1
        self.ncalls = ncalls
        return self.nrows - 1


class HDF5PointStore(FilePointStore):
    """HDF5-backed storage: a growing ``points`` dataset + ``ncalls`` attr."""

    FILES_OPENED = []

    def __init__(self, filepath, ncols, **h5_file_args):
        """Load and append to storage at *filepath* with *ncols* columns.

        Extra kwargs are passed to ``h5py.File``. Re-opening a path already
        held open in this process closes the stale handle first (guards
        against stale notebook state).
        """
        import h5py
        self.ncols = int(ncols)
        self.stack_empty = True
        h5_file_args['mode'] = h5_file_args.get('mode', 'a')
        for i, (filepath2, fileobj2) in enumerate(HDF5PointStore.FILES_OPENED):
            if filepath == filepath2:
                fileobj2.close()
                HDF5PointStore.FILES_OPENED.pop(i)
        self.fileobj = h5py.File(filepath, **h5_file_args)
        HDF5PointStore.FILES_OPENED.append((filepath, self.fileobj))
        self._load()

    def _load(self):
        if 'points' not in self.fileobj:
            self.fileobj.create_dataset(
                'points', dtype=float,
                shape=(0, self.ncols), maxshape=(None, self.ncols))
        self.nrows, ncols = self.fileobj['points'].shape
        if ncols != self.ncols:
            raise IOError(
                "Tried to resume from file '%s', which has a different "
                "number of columns!" % self.fileobj)
        points = self.fileobj['points'][:]
        self.stack = list(enumerate(points))
        self.ncalls = self.fileobj.attrs.get('ncalls', len(self.stack))
        self.reset()

    def add(self, row, ncalls):
        r"""Append row = [Lmin, L, \*otherinfo]; returns its index."""
        if len(row) != self.ncols:
            raise ValueError("expected %d values, got %d in %s"
                             % (self.ncols, len(row), row))
        self.fileobj['points'].resize(self.nrows + 1, axis=0)
        self.fileobj['points'][self.nrows, :] = row
        if self.ncalls != ncalls:
            self.ncalls = self.fileobj.attrs['ncalls'] = ncalls
        self.nrows += 1
        return self.nrows - 1
