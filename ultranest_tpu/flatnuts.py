# noqa: D400 D205
"""
FLATNUTS: No-U-turn sampling on flat priors
-------------------------------------------

Directional no-U-turn sampling in the unit cube for nested sampling:
paths travel in straight lines, reflecting off the likelihood contour
(normals guessed from the MLFriends region) and the cube walls. The
"clocked" design makes exactly one likelihood evaluation per `next()`
call, so populations of samplers can run in lock-step.

Rebuild of `/root/reference/ultranest/flatnuts.py` (experimental family).
"""

import numpy as np
from numpy.linalg import norm

from .samplingpath import angle, extrapolate_ahead

__all__ = ['SingleJumper', 'DirectJumper', 'IntervalJumper',
           'ClockedSimpleStepSampler', 'ClockedStepSampler',
           'ClockedBisectSampler', 'ClockedNUTSSampler']


class SingleJumper:
    """Jump one step at a time; reverse direction on rejection."""

    def __init__(self, stepsampler, nsteps=0):
        """Wrap a clocked *stepsampler*; plan *nsteps* jumps."""
        self.stepsampler = stepsampler
        self.direction = +1
        assert nsteps > 0
        self.nsteps = nsteps
        self.isteps = 0
        self.currenti = 0
        self.naccepts = 0
        self.nrejects = 0

    def prepare_jump(self):
        """Queue the next single-step target on the step sampler."""
        self.stepsampler.set_nsteps(self.currenti + self.direction)

    def check_gaps(self, gaps):
        """No-op: single steps never produce unevaluated gaps."""
        pass

    def make_jump(self, gaps={}):
        """Advance one step (or reverse); returns (x, L) of the position."""
        target = self.currenti + self.direction
        pointi = [(j, xj, vj, Lj) for j, xj, vj, Lj
                  in self.stepsampler.points if j == target]
        if len(pointi) > 0:
            self.currenti = target
            self.naccepts += 1
        else:
            pointi = [(j, xj, vj, Lj) for j, xj, vj, Lj
                      in self.stepsampler.points if j == self.currenti]
            self.direction *= -1
            self.nrejects += 1
        self.isteps += 1
        return pointi[0][1], pointi[0][3]


class DirectJumper:
    """Jump all steps at once; leftover steps bounce off the path ends."""

    def __init__(self, stepsampler, nsteps, log=False):
        """Wrap a clocked *stepsampler*; plan *nsteps* jumps."""
        self.stepsampler = stepsampler
        self.direction = +1
        assert nsteps > 0
        self.nsteps = nsteps
        self.isteps = 0
        self.currenti = 0
        self.naccepts = 0
        self.nrejects = 0
        self.log = log

    def prepare_jump(self):
        """Queue the full-distance target on the step sampler."""
        self.stepsampler.set_nsteps(self.currenti + self.nsteps)

    def check_gaps(self, gaps):
        """Simulate the jumps; return an unevaluated landing point, if any.

        Returns (x, i) of a path position that needs evaluation, or
        (None, None) if the landing point is already known.
        """
        pointi = {j: (xj, Lj) for j, xj, vj, Lj in self.stepsampler.points}
        ilo, ihi = min(pointi.keys()), max(pointi.keys())
        currenti = self.currenti
        direction = self.direction
        for _ in range(self.nsteps):
            target = currenti + direction
            if ilo <= target <= ihi and not gaps.get(target, False):
                currenti = target
            else:
                direction *= -1
        if currenti in pointi:
            return None, None
        if currenti in gaps:
            assert gaps[currenti] is False, \
                "could not have jumped into a known gap"
            return None, None
        xj, vj, Lj, onpath = self.stepsampler.contourpath.interpolate(currenti)
        if Lj is not None:
            return None, None
        return xj, currenti

    def make_jump(self, gaps={}):
        """Execute the jumps; returns (x, L) of the landing point."""
        pointi = {j: (xj, Lj) for j, xj, vj, Lj in self.stepsampler.points}
        ilo, ihi = min(pointi.keys()), max(pointi.keys())
        for self.isteps in range(self.nsteps):
            target = self.currenti + self.direction
            if ilo <= target <= ihi and not gaps.get(target, False):
                self.currenti = target
                self.naccepts += 1
            else:
                self.direction *= -1
                self.nrejects += 1
        self.isteps += 1
        return pointi[self.currenti]


class IntervalJumper:
    """Expand the path in both directions, then sample the valid range."""

    def __init__(self, stepsampler, nsteps):
        """Wrap a clocked *stepsampler*; plan *nsteps* expansion."""
        self.stepsampler = stepsampler
        self.direction = +1
        assert nsteps >= 0
        self.nsteps = nsteps
        self.isteps = 0
        self.currenti = 0
        self.naccepts = 0
        self.nrejects = 0

    def prepare_jump(self):
        """Queue symmetric expansion targets on the step sampler."""
        target = self.currenti + self.nsteps
        self.stepsampler.set_nsteps(target)
        self.stepsampler.set_nsteps(-target)

    def make_jump(self):
        """Account for used/unused track length."""
        pointi = {j: (xj, Lj) for j, xj, vj, Lj in self.stepsampler.points}
        ilo, ihi = min(pointi.keys()), max(pointi.keys())
        a, b = self.nutssampler.validrange
        nused = b - a
        ntotal = ihi - ilo
        self.naccepts = nused
        self.nrejects = ntotal - nused
        return None


class ClockedSimpleStepSampler:
    """Base for samplers that advance a path one evaluation per call."""

    def __init__(self, contourpath, plot=False, log=False):
        """Start sampling on *contourpath* (a ContourSamplingPath)."""
        self.contourpath = contourpath
        self.points = self.contourpath.points
        self.nreflections = 0
        self.nreverses = 0
        self.plot = plot
        self.log = log
        self.reset()

    def reset(self):
        """Clear the goal stack."""
        self.goals = []

    def reverse(self, reflpoint, v, plot=False):
        """Reflect direction *v* off the contour surface at *reflpoint*."""
        normal = self.contourpath.gradient(reflpoint, plot=plot)
        if normal is None:
            return -v
        vnew = v - 2 * angle(normal, v) * normal
        assert vnew.shape == v.shape, (vnew.shape, v.shape)
        assert np.isclose(norm(vnew), norm(v)), (vnew, v)
        return vnew

    def set_nsteps(self, i):
        """Add the goal of sampling the path position *i*."""
        self.goals.insert(0, ('sample-at', i))

    def is_done(self):
        """Whether all goals have been achieved."""
        return self.goals == []

    def expand_onestep(self, fwd, transform, loglike, Lmin):
        """Helper: advance the path one step forward (or backward)."""
        if fwd:
            starti, _, _, _ = max(self.points)
            i = starti + 1
        else:
            starti, _, _, _ = min(self.points)
            i = starti - 1
        return self.expand_to_step(i, transform, loglike, Lmin)

    def expand_to_step(self, nsteps, transform, loglike, Lmin):
        """Helper: advance the path to position *nsteps*."""
        self.set_nsteps(nsteps)
        return self.get_independent_sample(transform, loglike, Lmin)

    def get_independent_sample(self, transform, loglike, Lmin):
        """Helper: call :meth:`next` until an independent sample returns."""
        Llast = None
        while True:
            sample, is_independent = self.next(Llast)
            if sample is None:
                return None, None
            if is_independent:
                unew, Lnew = sample
                return unew, Lnew
            unew = sample
            xnew = transform(unew)
            Llast = loglike(xnew)
            if Llast < Lmin:
                Llast = None


class ClockedStepSampler(ClockedSimpleStepSampler):
    """Evaluate every step along the path, reflecting when outside."""

    def continue_sampling(self, i):
        """Queue goals to reach position *i*, reversing if impossible."""
        if (i > 0 and self.contourpath.samplingpath.fwd_possible) or \
                (i < 0 and self.contourpath.samplingpath.rwd_possible):
            self.goals.insert(0, ('expand-to', i))
            self.goals.append(('sample-at', i))
        else:
            if i > 0:
                starti, _, _, _ = max(self.points)
                reversei = starti + 1
            else:
                starti, _, _, _ = min(self.points)
                reversei = starti - 1
            self.nreverses += 1
            deltai = i - starti
            self.goals.append(('sample-at', reversei - deltai))

    def expand_to(self, i):
        """Queue the evaluation of the next path step towards *i*."""
        if i > 0 and self.contourpath.samplingpath.fwd_possible:
            starti, startx, startv, _ = max(self.points)
            if i > starti:
                j = starti + 1
                xj, v = self.contourpath.extrapolate(j)
                if j != i:
                    self.goals.insert(0, ('expand-to', i))
                self.goals.insert(0, ('eval-at', j, xj, v, +1))
                return xj, False
        elif i < 0 and self.contourpath.samplingpath.rwd_possible:
            starti, startx, startv, _ = min(self.points)
            if i < starti:
                j = starti - 1
                xj, v = self.contourpath.extrapolate(j)
                if j != i:
                    self.goals.insert(0, ('expand-to', i))
                self.goals.insert(0, ('eval-at', j, xj, v, -1))
                return xj, False
        return None

    def eval_at(self, j, xj, v, sign, Llast):
        """Accept an evaluated step, or queue a reflection if outside."""
        if Llast is not None:
            self.contourpath.add(j, xj, v, Llast)
        else:
            self.nreflections += 1
            vk = self.reverse(xj, v * sign, plot=self.plot) * sign
            xk, vk = extrapolate_ahead(sign, xj, vk,
                                       contourpath=self.contourpath)
            self.goals.insert(0, ('reflect-at', j, xk, vk, sign))
            return xk, False

    def reflect_at(self, j, xk, vk, sign, Llast):
        """Accept a reflected step, or close this path direction."""
        self.nreflections += 1
        if Llast is not None:
            self.contourpath.add(j, xk, vk, Llast)
        else:
            if sign == 1:
                self.contourpath.samplingpath.fwd_possible = False
            else:
                self.contourpath.samplingpath.rwd_possible = False

    def next(self, Llast=None):
        """Process goals; returns (point_or_coords, is_independent)."""
        while self.goals:
            goal = self.goals.pop(0)
            if goal[0] == 'sample-at':
                i = goal[1]
                assert Llast is None
                if not self.contourpath.samplingpath.fwd_possible \
                        and not self.contourpath.samplingpath.rwd_possible \
                        and len(self.points) == 1:
                    starti, startx, startv, startL = self.points[0]
                    return (startx, startL), True
                pointi = [(j, xj, vj, Lj) for j, xj, vj, Lj in self.points
                          if j == i]
                if len(pointi) != 0:
                    _, xj, _, Lj = pointi[0]
                    return (xj, Lj), True
                self.continue_sampling(i)
            elif goal[0] == 'expand-to':
                ret = self.expand_to(goal[1])
                if ret is not None:
                    return ret
            elif goal[0] == 'eval-at':
                _, j, xj, v, sign = goal
                ret = self.eval_at(j, xj, v, sign, Llast)
                Llast = None
                if ret is not None:
                    return ret
            elif goal[0] == 'reflect-at':
                _, j, xk, vk, sign = goal
                self.reflect_at(j, xk, vk, sign, Llast)
                Llast = None
            else:
                raise AssertionError(goal)
        return None, False


class ClockedBisectSampler(ClockedStepSampler):
    """Jump to the target directly, bisecting for the contour crossing."""

    def continue_sampling(self, i):
        """Queue goals to reach position *i*, interpolating when inside."""
        if i > 0:
            starti, _, _, _ = max(self.points)
            inside = i < starti
            more_possible = self.contourpath.samplingpath.fwd_possible
        else:
            starti, _, _, _ = min(self.points)
            inside = starti < i
            more_possible = self.contourpath.samplingpath.rwd_possible

        if inside:
            xj, vj, Lj, onpath = self.contourpath.interpolate(i)
            if Lj is not None:
                return (xj, Lj), True
            # interior point exists but was never evaluated: no further
            # goals queued (matches reference behaviour at flatnuts.py:613)
            return None
        elif more_possible:
            self.goals.insert(0, ('expand-to', i))
            self.goals.append(('sample-at', i))
        else:
            if i > 0:
                starti, _, _, _ = max(self.points)
                reversei = starti + 1
            else:
                starti, _, _, _ = min(self.points)
                reversei = starti - 1
            self.nreverses += 1
            deltai = i - starti
            self.goals.append(('sample-at', reversei - deltai))

    def expand_to(self, j):
        """Queue a direct jump towards *j* with bisection on failure."""
        if j > 0 and self.contourpath.samplingpath.fwd_possible:
            starti, startx, startv, _ = max(self.points)
            if j > starti:
                xj, v = self.contourpath.extrapolate(j)
                self.goals.insert(0, ('bisect', starti, startx, startv,
                                      None, None, None, j, xj, v, +1))
                return xj, False
        elif j < 0 and self.contourpath.samplingpath.rwd_possible:
            starti, startx, startv, _ = min(self.points)
            if j < starti:
                xj, v = self.contourpath.extrapolate(j)
                self.goals.insert(0, ('bisect', starti, startx, startv,
                                      None, None, None, j, xj, v, -1))
                return xj, False
        return None

    def bisect_at(self, lefti, leftx, leftv, midi, midx, midv, righti,
                  rightx, rightv, sign, Llast):
        """Shrink the inside/outside bracket; reflect at the crossing."""
        if midi is None:
            if Llast is not None:
                # the full jump landed inside: done
                self.contourpath.add(righti, rightx, rightv, Llast)
                return None
        else:
            if Llast is not None:
                lefti, leftx, leftv = midi, midx, midv
                self.contourpath.add(midi, midx, midv, Llast)
            else:
                righti, rightx, rightv = midi, midx, midv

        midi = (righti + lefti) // 2
        if midi == lefti or midi == righti:
            # bracket closed: right is the first point outside
            vk = self.reverse(rightx, rightv * sign, plot=self.plot) * sign
            xk, vk = extrapolate_ahead(sign, rightx, vk,
                                       contourpath=self.contourpath)
            self.nreflections += 1
            self.goals.insert(0, ('reflect-at', righti, xk, vk, sign))
            return xk, False
        else:
            midx, midv = extrapolate_ahead(midi - lefti, leftx, leftv,
                                           contourpath=self.contourpath)
            self.goals.insert(0, ('bisect', lefti, leftx, leftv, midi, midx,
                                  midv, righti, rightx, rightv, sign))
            return midx, False

    def next(self, Llast=None):
        """Process goals; returns (point_or_coords, is_independent)."""
        while self.goals:
            goal = self.goals.pop(0)
            if goal[0] == 'sample-at':
                i = goal[1]
                assert Llast is None
                if not self.contourpath.samplingpath.fwd_possible \
                        and not self.contourpath.samplingpath.rwd_possible \
                        and len(self.points) == 1:
                    starti, startx, startv, startL = self.points[0]
                    return (startx, startL), True
                pointi = [(j, xj, vj, Lj) for j, xj, vj, Lj in self.points
                          if j == i]
                if len(pointi) == 1:
                    _, xj, _, Lj = pointi[0]
                    return (xj, Lj), True
                ret = self.continue_sampling(i)
                if ret is not None:
                    return ret
            elif goal[0] == 'expand-to':
                ret = self.expand_to(goal[1])
                if ret is not None:
                    return ret
            elif goal[0] == 'bisect':
                (_, lefti, leftx, leftv, midi, midx, midv, righti, rightx,
                 rightv, sign) = goal
                ret = self.bisect_at(lefti, leftx, leftv, midi, midx, midv,
                                     righti, rightx, rightv, sign, Llast)
                Llast = None
                if ret is not None:
                    return ret
            elif goal[0] == 'reflect-at':
                _, j, xk, vk, sign = goal
                self.reflect_at(j, xk, vk, sign, Llast)
                Llast = None
            else:
                raise AssertionError(goal)
        return None, False


class ClockedNUTSSampler(ClockedBisectSampler):
    """No-U-turn sampler on flat likelihood-constrained surfaces."""

    def reset(self):
        """Reset the doubling tree state."""
        self.goals = []
        self.left_state = self.points[0][:3]
        self.right_state = self.points[0][:3]
        self.left_warmed_up = False
        self.right_warmed_up = False
        self.tree_built = False
        self.validrange = (0, 0)
        self.tree_depth = 0
        self.current_direction = np.random.randint(2) == 1

    def next(self, Llast=None):
        """Double the track alternatingly until the NUTS criterion stops it."""
        while not self.tree_built:
            rwd = self.current_direction

            if rwd:
                goal = ('expand-to', self.left_state[0] - 2**self.tree_depth)
            else:
                goal = ('expand-to', self.right_state[0] + 2**self.tree_depth)
            if goal not in self.goals:
                self.goals.append(goal)

            while self.goals:
                sample, is_independent = ClockedBisectSampler.next(
                    self, Llast=Llast)
                Llast = None
                if sample is not None:
                    return sample, is_independent

            if rwd:
                self.left_state, _, newrange, newstop = self.build_tree(
                    self.left_state, self.tree_depth, rwd=rwd)
            else:
                _, self.right_state, newrange, newstop = self.build_tree(
                    self.right_state, self.tree_depth, rwd=rwd)

            if not newstop:
                self.validrange = (min(self.validrange[0], newrange[0]),
                                   max(self.validrange[1], newrange[1]))

            ileft, xleft, vleft = self.left_state
            iright, xright, vright = self.right_state

            # the U-turn criterion
            stop = newstop or angle(xright - xleft, vleft) <= 0 \
                or angle(xright - xleft, vright) <= 0
            # stop if we cannot continue in any direction
            stop = stop and (self.contourpath.samplingpath.fwd_possible
                             or self.contourpath.samplingpath.rwd_possible)

            if stop:
                self.tree_built = True
            else:
                self.tree_depth = self.tree_depth + 1
                self.current_direction = np.random.randint(2) == 1

        return self.sample_chain_point(self.validrange[0], self.validrange[1])

    def sample_chain_point(self, a, b):
        """Pick a random evaluated point on the track between a and b."""
        while True:
            i = np.random.randint(a, b + 1)
            xi, vi, Li, onpath = self.contourpath.interpolate(i)
            if not onpath:
                continue
            return (xi, Li), True

    def build_tree(self, startstate, j, rwd):
        """Recursively build a depth-*j* subtree; returns (left, right, range, stop)."""
        if j == 0:
            i = startstate[0] + (-1 if rwd else +1)
            xi, vi, _, _ = self.contourpath.interpolate(i)
            return (i, xi, vi), (i, xi, vi), (i, i), False

        (ileft, xleft, vleft), (iright, xright, vright), rangea, stopa = \
            self.build_tree(startstate, j - 1, rwd)
        if stopa:
            return (ileft, xleft, vleft), (iright, xright, vright), \
                (ileft, iright), stopa
        if rwd:
            (ileft, xleft, vleft), _, rangeb, stopb = self.build_tree(
                (ileft, xleft, vleft), j - 1, rwd)
        else:
            _, (iright, xright, vright), rangeb, stopb = self.build_tree(
                (iright, xright, vright), j - 1, rwd)
        stop = stopa or stopb or angle(xright - xleft, vleft) <= 0 \
            or angle(xright - xleft, vright) <= 0 \
            or angle(vleft, vright) <= 0
        return (ileft, xleft, vleft), (iright, xright, vright), \
            (ileft, iright), stop
