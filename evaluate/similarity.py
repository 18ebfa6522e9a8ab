#!/usr/bin/env python
"""Measure normalized code similarity against the reference implementation.

For each repo module, compares against the same-named reference file:
lines are normalized (strip whitespace, drop comments/docstrings/blank
lines), then scored by (a) the fraction of repo lines that also occur in
the reference file's line set with locality, via difflib matching
blocks, and (b) the longest run of consecutive identical lines.

Usage::

    python evaluate/similarity.py [file ...]
"""

import difflib
import io
import os
import sys
import tokenize

REPO = os.path.join(os.path.dirname(os.path.abspath(__file__)), '..')
REF = '/root/reference/ultranest'

PAIRS = {
    'ultranest_tpu/integrator.py': 'integrator.py',
    'ultranest_tpu/netiter.py': 'netiter.py',
    'ultranest_tpu/stepsampler.py': 'stepsampler.py',
    'ultranest_tpu/popstepsampler.py': 'popstepsampler.py',
    'ultranest_tpu/hotstart.py': 'hotstart.py',
    'ultranest_tpu/store.py': 'store.py',
    'ultranest_tpu/utils.py': 'utils.py',
    'ultranest_tpu/viz.py': 'viz.py',
    'ultranest_tpu/plot.py': 'plot.py',
    'ultranest_tpu/ordertest.py': 'ordertest.py',
    'ultranest_tpu/calibrator.py': 'calibrator.py',
    'ultranest_tpu/solvecompat.py': 'solvecompat.py',
    'ultranest_tpu/samplingpath.py': 'samplingpath.py',
    'ultranest_tpu/flatnuts.py': 'flatnuts.py',
    'ultranest_tpu/pathsampler.py': 'pathsampler.py',
    'ultranest_tpu/dyhmc.py': 'dyhmc.py',
    'ultranest_tpu/dychmc.py': 'dychmc.py',
    'ultranest_tpu/mlfriends.py': 'mlfriends.pyx',
    'ultranest_tpu/ops/stepfuncs.py': 'stepfuncs.pyx',
}


def normalize(path):
    """Code lines with comments/docstrings/blank lines removed."""
    src = open(path).read()
    out = []
    try:
        toks = list(tokenize.generate_tokens(io.StringIO(src).readline))
    except Exception:
        toks = None
    drop_strings = set()
    if toks is not None:
        prev_significant = None
        for tok in toks:
            if tok.type == tokenize.STRING:
                # docstring: a string statement (previous significant
                # token is a NEWLINE/INDENT/DEDENT or none)
                if prev_significant in (None, tokenize.NEWLINE,
                                        tokenize.INDENT, tokenize.DEDENT):
                    for ln in range(tok.start[0], tok.end[0] + 1):
                        drop_strings.add(ln)
            if tok.type not in (tokenize.COMMENT, tokenize.NL):
                prev_significant = tok.type
    for i, line in enumerate(src.split('\n'), 1):
        if i in drop_strings:
            continue
        line = line.split('#')[0].strip() if '#' in line else line.strip()
        if line:
            out.append(' '.join(line.split()))
    return out


def compare(repo_file, ref_file):
    a = normalize(repo_file)
    b = normalize(ref_file)
    sm = difflib.SequenceMatcher(None, a, b, autojunk=False)
    blocks = sm.get_matching_blocks()
    matched = sum(bl.size for bl in blocks)
    longest = max((bl.size for bl in blocks), default=0)
    runs8 = sum(bl.size for bl in blocks if bl.size >= 8)
    return dict(lines=len(a), ref_lines=len(b),
                similarity=matched / max(len(a), 1),
                longest_run=longest,
                lines_in_runs8=runs8,
                frac_in_runs8=runs8 / max(len(a), 1))


def main():
    targets = sys.argv[1:] or sorted(PAIRS)
    print('%-36s %6s %6s %5s %8s %7s' % (
        'file', 'lines', 'sim', 'run', 'runs>=8', 'frac8'))
    for repo_rel in targets:
        ref_rel = PAIRS.get(repo_rel)
        if ref_rel is None:
            continue
        repo_file = os.path.join(REPO, repo_rel)
        ref_file = os.path.join(REF, ref_rel)
        if not (os.path.exists(repo_file) and os.path.exists(ref_file)):
            continue
        r = compare(repo_file, ref_file)
        flag = ' <-- ' if (r['similarity'] >= 0.35
                           or r['longest_run'] >= 8) else ''
        print('%-36s %6d %6.2f %5d %8d %6.0f%%%s' % (
            repo_rel, r['lines'], r['similarity'], r['longest_run'],
            r['lines_in_runs8'], 100 * r['frac_in_runs8'], flag))


if __name__ == '__main__':
    main()
