# noqa: D400 D205
"""
Dynamic Constrained Hamiltonian Monte Carlo
-------------------------------------------

"Billiard ball" sampling: straight-line trajectories inside the
likelihood constraint, reflecting off the L >= Lmin boundary using the
likelihood gradient, with NUTS-style dynamic doubling of the trajectory.
Rebuild of `/root/reference/ultranest/dychmc.py` (experimental family).

On this framework, gradients come for free from JAX:
use :func:`gradient_from_jax` to build the reflection normal from a
jax-traceable likelihood instead of hand-deriving it.
"""

import numpy as np

__all__ = ['stop_criterion', 'step_or_reflect', 'build_tree', 'tree_sample',
           'generate_uniform_direction', 'DynamicCHMCSampler',
           'gradient_from_jax']


def gradient_from_jax(jax_loglike, jax_transform=None):
    """Build a u-space contour-normal function via jax autodiff.

    Parameters
    ----------
    jax_loglike: jax function
        batched log-likelihood (n, params) -> (n,)
    jax_transform: jax function or None
        batched prior transform

    Returns
    -------
    gradient: function
        (u_vector) -> unit normal of the likelihood contour at u
    """
    import jax
    import jax.numpy as jnp

    def scalar_logl(u):
        ub = u.reshape((1, -1))
        p = jax_transform(ub) if jax_transform is not None else ub
        return jax_loglike(p)[0]

    grad_fn = jax.jit(jax.grad(scalar_logl))

    def gradient(u):
        g = np.asarray(grad_fn(jnp.asarray(u, jnp.float32)), dtype=float)
        n = (g**2).sum() ** 0.5
        if n == 0:
            return None
        return g / n

    return gradient


def stop_criterion(thetaminus, thetaplus, rminus, rplus):
    """NUTS U-turn criterion: both ends still move apart."""
    dtheta = thetaplus - thetaminus
    return (np.dot(dtheta, rminus.T) >= 0) & (np.dot(dtheta, rplus.T) >= 0)


def step_or_reflect(theta, v, epsilon, transform, loglike, gradient, Lmin):
    """One step of size *epsilon* from *theta* along *v*; reflect if outside.

    Returns (theta', v', p', logL', reflected).
    """
    thetaprime = theta + epsilon * v
    mask = np.logical_and(thetaprime > 0, thetaprime < 1)
    if mask.all():
        p = transform(thetaprime.reshape((1, -1)))
        logL = loglike(p)[0]
        if logL > Lmin:
            return thetaprime, v, p[0], logL, False
        # left the constraint: reflect off the contour normal
        normal = gradient(thetaprime)
    else:
        # left the cube: reflect inward off the walls
        normal = np.where(thetaprime <= 0, 1,
                          np.where(thetaprime >= 1, -1, 0)).astype(float)

    vnew = v - 2 * np.dot(normal, v) * normal

    # a reversing reflection cannot help: stop here
    if np.dot(v, vnew) <= 0:
        return thetaprime, vnew, None, -np.inf, True

    thetaprime2 = thetaprime + epsilon * vnew
    mask2 = np.logical_and(thetaprime2 > 0, thetaprime2 < 1)
    if mask2.all():
        p2 = transform(thetaprime2.reshape((1, -1)))
        logL2 = loglike(p2)[0]
        return thetaprime2, vnew, p2[0], logL2, True
    return thetaprime2, vnew, None, -np.inf, True


def build_tree(theta, v, direction, j, epsilon, transform, loglike, gradient,
               Lmin):
    """Recursively build the depth-*j* trajectory subtree."""
    if j == 0:
        thetaprime, vprime, pprime, logpprime, reflected = step_or_reflect(
            theta=theta, v=v * direction, epsilon=epsilon,
            transform=transform, loglike=loglike, gradient=gradient,
            Lmin=Lmin)
        thetaminus = thetaprime
        thetaplus = thetaprime

        if reflected and np.dot(v, vprime) <= 0:
            # locally reversing reflection: trajectory end, not a stop
            sprime = True
            can_continue = False
            vminus = v * direction
            vplus = v * direction
        else:
            sprime = logpprime > Lmin
            can_continue = True
            vminus = vprime * direction
            vplus = vprime * direction

        pminus = pprime
        pplus = pprime
        alphaprime = 1.0 * (sprime and can_continue)
        nalphaprime = 1
        nreflectprime = reflected * 1
    else:
        (thetaminus, vminus, pminus, thetaplus, vplus, pplus, thetaprime,
         vprime, pprime, logpprime, sprime, can_continue, alphaprime,
         nalphaprime, nreflectprime) = build_tree(
            theta, v, direction, j - 1, epsilon, transform, loglike,
            gradient, Lmin)
        if can_continue and sprime:
            if direction == -1:
                (thetaminus, vminus, pminus, _, _, _, thetaprime2, vprime2,
                 pprime2, logpprime2, sprime2, can_continue2, alphaprime2,
                 nalphaprime2, nreflectprime2) = build_tree(
                    thetaminus, vminus, direction, j - 1, epsilon, transform,
                    loglike, gradient, Lmin)
            else:
                (_, _, _, thetaplus, vplus, pplus, thetaprime2, vprime2,
                 pprime2, logpprime2, sprime2, can_continue2, alphaprime2,
                 nalphaprime2, nreflectprime2) = build_tree(
                    thetaplus, vplus, direction, j - 1, epsilon, transform,
                    loglike, gradient, Lmin)

            if np.random.uniform() < alphaprime2 / max(
                    alphaprime + alphaprime2, 1e-300):
                thetaprime = thetaprime2[:]
                vprime = vprime2[:]
                pprime = pprime2[:]
                logpprime = logpprime2

            sturn = stop_criterion(thetaminus, thetaplus, vminus, vplus)
            sprime = sprime and sprime2 and sturn
            can_continue = can_continue and can_continue2
            alphaprime += alphaprime2
            nalphaprime += nalphaprime2
            nreflectprime += nreflectprime2

    return (thetaminus, vminus, pminus, thetaplus, vplus, pplus, thetaprime,
            vprime, pprime, logpprime, sprime, can_continue, alphaprime,
            nalphaprime, nreflectprime)


def tree_sample(theta, p, logL, v, epsilon, transform, loglike, gradient,
                Lmin, maxheight=np.inf):
    """Sample from a dynamically doubled billiard trajectory."""
    thetaminus = theta
    thetaplus = theta
    vminus = v[:]
    vplus = v[:]
    alpha = 1
    nalpha = 1
    nreflect = 0
    logp = logL
    fwd_possible = True
    rwd_possible = True

    j = 0
    s = True
    while s and j < maxheight:
        if fwd_possible and rwd_possible:
            direction = int(2 * (np.random.uniform() < 0.5) - 1)
        elif fwd_possible:
            direction = 1
        elif rwd_possible:
            direction = -1
        else:
            break

        if direction == -1:
            (thetaminus, vminus, pminus, _, _, _, thetaprime, vprime, pprime,
             logpprime, sprime, can_continue, alphaprime, nalphaprime,
             nreflectprime) = build_tree(
                thetaminus, vminus, direction, j, epsilon, transform, loglike,
                gradient, Lmin)
        else:
            (_, _, _, thetaplus, vplus, pplus, thetaprime, vprime, pprime,
             logpprime, sprime, can_continue, alphaprime, nalphaprime,
             nreflectprime) = build_tree(
                thetaplus, vplus, direction, j, epsilon, transform, loglike,
                gradient, Lmin)

        if sprime and np.random.uniform() < alphaprime / (alpha + alphaprime):
            theta = thetaprime
            p = pprime
            logp = logpprime
            v = vprime

        alpha += alphaprime
        nalpha += nalphaprime
        nreflect += nreflectprime

        sturn = stop_criterion(thetaminus, thetaplus, vminus, vplus)
        s = sprime and sturn

        if not can_continue:
            if direction == 1:
                fwd_possible = False
            if direction == -1:
                rwd_possible = False
        j += 1

    return alpha, nreflect, nalpha, theta, p, logp, j


def generate_uniform_direction(d, massmatrix):
    """Draw a unit direction vector according to the mass matrix."""
    momentum = np.random.multivariate_normal(
        np.zeros(d), np.dot(massmatrix, np.eye(d)))
    momentum /= (momentum**2).sum() ** 0.5
    return momentum


class DynamicCHMCSampler:
    """Dynamic constrained HMC: a billiard ball inside the constraint.

    The ball travels in straight lines and reflects off the likelihood
    contour (via the gradient) and the cube walls; a No-U-turn criterion
    with randomized doubling avoids circular trajectories.
    """

    def __init__(self, scale, nsteps, adaptive_nsteps=False, delta=0.9,
                 nudge=1.04):
        """Initialise.

        Parameters
        ----------
        scale: float
            stepsize epsilon
        nsteps: int
            number of accepted steps per independent sample
        adaptive_nsteps: False or str
            early-termination criterion (see reference dychmc.py:257-266)
        delta: float
            target acceptance rate for step size adaptation
        nudge: float
            step size adjustment factor (> 1)
        """
        self.history = []
        self.nsteps = nsteps
        self.scale = scale
        self.nudge = nudge
        self.nsteps_nudge = 1.01
        adaptive_nsteps_options = (
            False, 'proposal-total-distances-NN',
            'proposal-summed-distances-NN', 'proposal-total-distances',
            'proposal-summed-distances', 'move-distance',
            'move-distance-midway', 'proposal-summed-distances-min-NN',
            'proposal-variance-min', 'proposal-variance-min-NN')
        if adaptive_nsteps not in adaptive_nsteps_options:
            raise ValueError(
                "adaptive_nsteps must be one of: %s, not '%s'"
                % (adaptive_nsteps_options, adaptive_nsteps))
        self.adaptive_nsteps = adaptive_nsteps
        self.mean_pair_distance = np.nan
        self.delta = delta
        self.massmatrix = 1
        self.invmassmatrix = 1

        self.logstat = []
        self.logstat_labels = ['acceptance_rate', 'reflect_fraction',
                               'stepsize', 'treeheight']
        if adaptive_nsteps:
            self.logstat_labels += ['jump-distance', 'reference-distance']
        self.logstat_trajectory = []

    def set_gradient(self, gradient):
        """Set the likelihood-contour gradient function."""
        self.gradient = gradient

    def __str__(self):
        """Get string representation."""
        if not self.adaptive_nsteps:
            return type(self).__name__ + '(nsteps=%d)' % self.nsteps
        return type(self).__name__ + '(adaptive_nsteps=%s)' \
            % self.adaptive_nsteps

    def plot(self, filename):
        """Plot sampler statistics to *filename*."""
        if len(self.logstat) == 0:
            return
        import matplotlib.pyplot as plt
        plt.figure(figsize=(10, 1 + 3 * len(self.logstat_labels)))
        for i, label in enumerate(self.logstat_labels):
            part = [entry[i] for entry in self.logstat]
            plt.subplot(len(self.logstat_labels), 1, 1 + i)
            plt.ylabel(label)
            plt.plot(part)
            if np.min(part) > 0:
                plt.yscale('log')
        plt.savefig(filename, bbox_inches='tight')
        np.savetxt(filename + '.txt.gz', self.logstat,
                   header=','.join(self.logstat_labels), delimiter=',')
        plt.close()

    def __next__(self, region, Lmin, us, Ls, transform, loglike, ndraw=40,
                 plot=False, tregion=None):
        """Run nsteps of billiard trajectories; return the final point."""
        self.transform = transform
        self.loglike = loglike

        i = np.random.randint(len(Ls))
        self.starti = i
        ui = us[i, :]
        Li = Ls[i]
        pi = None
        assert np.logical_and(ui > 0, ui < 1).all(), ui

        ncalls_total = 1
        history = [(ui, Li)]

        nsteps_remaining = self.nsteps
        while nsteps_remaining > 0:
            unew, pnew, Lnew, nc, alpha, fracreflect, treeheight = self.move(
                ui, pi, Li, region=region, ndraw=ndraw, plot=plot, Lmin=Lmin)
            if pnew is not None:
                nsteps_remaining = nsteps_remaining - 1
            ncalls_total += nc
            assert np.logical_and(unew > 0, unew < 1).all(), unew
            ui, pi, Li = unew, pnew, Lnew
            history.append((ui, Li))
            self.logstat_trajectory.append([alpha, fracreflect, treeheight])

        self.adjust_stepsize()
        self.adjust_nsteps(region, history)
        return ui, pi, Li, ncalls_total

    def move(self, ui, pi, Li, region, Lmin, ndraw=1, plot=False):
        """One dynamically doubled trajectory from (ui, Li)."""
        epsilon = self.scale
        epsilon_here = 10 ** np.random.normal(0, 0.3) * epsilon
        d = len(ui)
        assert Li >= Lmin

        v = generate_uniform_direction(d, self.massmatrix)
        alpha, nreflects, nalpha, theta, pnew, Lnew, treeheight = tree_sample(
            ui, pi, Li, v, epsilon_here, self.transform, self.loglike,
            self.gradient, Lmin, maxheight=15)
        return (theta, pnew, Lnew, nalpha, alpha / nalpha,
                nreflects / nalpha, treeheight)

    def create_problem(self, Ls, region):
        """Derive mass matrices from the region whitening layer."""
        layer = region.transformLayer
        if hasattr(layer, 'invT'):
            self.invmassmatrix = layer.cov
            self.massmatrix = np.linalg.inv(self.invmassmatrix)
        elif hasattr(layer, 'std'):
            if np.shape(layer.std) == () and layer.std == 1:
                self.massmatrix = 1
                self.invmassmatrix = 1
            else:
                self.invmassmatrix = np.diag(layer.std[0] ** 2)
                self.massmatrix = np.diag(layer.std[0] ** -2)

    def adjust_stepsize(self):
        """Aggregate trajectory statistics and adapt the step size."""
        if len(self.logstat_trajectory) == 0:
            return
        self.logstat.append([
            np.mean([a for a, fr, th in self.logstat_trajectory]),
            np.mean([fr for a, fr, th in self.logstat_trajectory]),
            float(self.scale),
            np.mean([2**th for a, fr, th in self.logstat_trajectory]),
        ])
        N = int(max(200 // self.nsteps, 1))
        alphamean = np.mean([parts[0] for parts in self.logstat[-N:]])
        if alphamean > self.delta:
            self.scale *= self.nudge ** (1.0 / N)
        else:
            self.scale /= self.nudge ** (1.0 / N)
        self.logstat_trajectory = []

    def region_changed(self, Ls, region):
        """React to a region rebuild: adapt stepsize and mass matrix."""
        self.adjust_stepsize()
        self.create_problem(Ls, region)
        self.mean_pair_distance = region.compute_mean_pair_distance()

    def adjust_nsteps(self, region, history):
        """Adapt the number of steps using the chosen distance criterion."""
        if not self.adaptive_nsteps:
            return
        if len(history) < self.nsteps:
            return
        assert np.isfinite(self.mean_pair_distance)
        nlive, ndim = region.u.shape
        tproposed = region.transformLayer.transform(
            np.asarray([u for u, _ in history]))
        crit = self.adaptive_nsteps
        if crit == 'proposal-total-distances':
            d2 = ((((tproposed[0] - tproposed)**2).sum(axis=1))**0.5).sum()
            far_enough, ref = d2 > self.mean_pair_distance / ndim, \
                self.mean_pair_distance
        elif crit == 'proposal-total-distances-NN':
            d2 = ((((tproposed[0] - tproposed)**2).sum(axis=1))**0.5).sum()
            far_enough, ref = d2 > region.maxradiussq**0.5, \
                region.maxradiussq**0.5
        elif crit == 'proposal-summed-distances':
            d2 = (((tproposed[1:, :] - tproposed[:-1, :])**2).sum(axis=1)
                  ** 0.5).sum()
            far_enough, ref = d2 > self.mean_pair_distance / ndim, \
                self.mean_pair_distance
        elif crit == 'proposal-summed-distances-NN':
            d2 = (((tproposed[1:, :] - tproposed[:-1, :])**2).sum(axis=1)
                  ** 0.5).sum()
            far_enough, ref = d2 > region.maxradiussq**0.5, \
                region.maxradiussq**0.5
        elif crit == 'proposal-summed-distances-min-NN':
            d2 = (np.abs(tproposed[1:, :] - tproposed[:-1, :]).sum(axis=1)).min()
            far_enough, ref = d2 > region.maxradiussq**0.5, \
                region.maxradiussq**0.5
        elif crit == 'proposal-variance-min':
            d2 = tproposed.std(axis=0).min()
            far_enough, ref = d2 > self.mean_pair_distance / ndim, \
                self.mean_pair_distance
        elif crit == 'proposal-variance-min-NN':
            d2 = tproposed.std(axis=0).min()
            far_enough, ref = d2 > region.maxradiussq**0.5, \
                region.maxradiussq**0.5
        elif crit == 'move-distance':
            tstart, tfinal = region.transformLayer.transform(
                np.vstack((history[0][0], history[-1][0])))
            d2 = ((tstart - tfinal)**2).sum()
            far_enough, ref = d2 > region.maxradiussq, region.maxradiussq**0.5
        elif crit == 'move-distance-midway':
            middle = max(1, len(history) // 2)
            tstart, tfinal = region.transformLayer.transform(
                np.vstack((history[0][0], history[middle][0])))
            d2 = ((tstart - tfinal)**2).sum()
            far_enough, ref = d2 > region.maxradiussq, region.maxradiussq**0.5
        else:
            raise AssertionError(crit)
        self.logstat[-1] = self.logstat[-1] + [d2, ref]

        if far_enough:
            self.nsteps = min(self.nsteps - 1,
                              int(self.nsteps / self.nsteps_nudge))
        else:
            self.nsteps = max(self.nsteps + 1,
                              int(self.nsteps * self.nsteps_nudge))
        self.nsteps = max(1, min(1000, self.nsteps))
