# noqa: D400 D205
"""
Dynamic Hamiltonian Monte Carlo on a flattened auxiliary surface
----------------------------------------------------------------

Uses likelihood gradients throughout the trajectory: the likelihood is
flattened through a beta-CDF auxiliary distribution built from the live
points, so trajectories orbit the contour instead of bouncing off walls;
a multinomial acceptance bias of 1/p recovers uniform prior sampling.
NUTS-style dynamic doubling chooses the trajectory length. Rebuild of
`/root/reference/ultranest/dyhmc.py` (experimental family).

With JAX likelihoods, the (p, logL, dlogL/du) triple can be built with
:func:`transform_loglike_gradient_from_jax` instead of hand-deriving it.
"""

import numpy as np
import scipy.special
import scipy.stats

__all__ = ['stop_criterion', 'leapfrog', 'build_tree', 'tree_sample',
           'find_beta_params_static', 'find_beta_params_dynamic',
           'generate_momentum_normal', 'generate_momentum',
           'generate_momentum_circle', 'generate_momentum_flattened',
           'FlattenedProblem', 'DynamicHMCSampler',
           'transform_loglike_gradient_from_jax']


def transform_loglike_gradient_from_jax(jax_loglike, jax_transform=None):
    """Build the (p, logL, dlogL/du) function via jax autodiff.

    Returns a function of a single unit-cube point, as expected by
    :class:`DynamicHMCSampler`.
    """
    import jax
    import jax.numpy as jnp

    def scalar_logl(u):
        ub = u.reshape((1, -1))
        p = jax_transform(ub) if jax_transform is not None else ub
        return jax_loglike(p)[0], p[0]

    val_grad = jax.jit(jax.value_and_grad(scalar_logl, has_aux=True))

    def transform_loglike_gradient(u):
        (L, p), g = val_grad(jnp.asarray(u, jnp.float32))
        return (np.asarray(p, float), float(L), np.asarray(g, float))

    return transform_loglike_gradient


def stop_criterion(thetaminus, thetaplus, rminus, rplus):
    """NUTS U-turn criterion: both ends still move apart."""
    dtheta = thetaplus - thetaminus
    return (np.dot(dtheta, rminus.T) >= 0) & (np.dot(dtheta, rplus.T) >= 0)


def leapfrog(theta, r, grad, epsilon, invmassmatrix, f):
    """Leapfrog step from *theta* with momentum *r*, stepsize *epsilon*."""
    rprime = r + 0.5 * epsilon * grad
    thetaprime = theta + epsilon * np.dot(invmassmatrix, rprime)
    (logpprime, gradprime), extra = f(thetaprime)
    rprime = rprime + 0.5 * epsilon * gradprime
    return thetaprime, rprime, gradprime, logpprime, extra


def build_tree(theta, r, grad, v, j, epsilon, invmassmatrix, f, joint0):
    """Recursively build the depth-*j* leapfrog subtree."""
    if j == 0:
        thetaprime, rprime, gradprime, logpprime, extraprime = leapfrog(
            theta, r, grad, v * epsilon, invmassmatrix, f)
        joint = logpprime - 0.5 * np.dot(
            np.dot(rprime, invmassmatrix), rprime.T)
        # terminate on wildly inaccurate simulation
        sprime = joint0 - 1000.0 < joint
        thetaminus = thetaprime[:]
        thetaplus = thetaprime[:]
        rminus = rprime[:]
        rplus = rprime[:]
        gradminus = gradprime[:]
        gradplus = gradprime[:]
        if not sprime:
            alphaprime = 0.0
        else:
            alphaprime = min(1.0, np.exp(joint - joint0))
        if logpprime < -300:
            betaprime = 0.0
        else:
            # bias the multinomial acceptance by 1/p for prior uniformity
            betaprime = alphaprime * np.exp(-logpprime)
        if betaprime == 0.0:
            sprime = False
        nalphaprime = 1
    else:
        (thetaminus, rminus, gradminus, thetaplus, rplus, gradplus,
         thetaprime, gradprime, logpprime, extraprime, rprime, sprime,
         alphaprime, betaprime, nalphaprime) = build_tree(
            theta, r, grad, v, j - 1, epsilon, invmassmatrix, f, joint0)
        if sprime:
            if v == -1:
                (thetaminus, rminus, gradminus, _, _, _, thetaprime2,
                 gradprime2, logpprime2, extraprime2, rprime2, sprime2,
                 alphaprime2, betaprime2, nalphaprime2) = build_tree(
                    thetaminus, rminus, gradminus, v, j - 1, epsilon,
                    invmassmatrix, f, joint0)
            else:
                (_, _, _, thetaplus, rplus, gradplus, thetaprime2,
                 gradprime2, logpprime2, extraprime2, rprime2, sprime2,
                 alphaprime2, betaprime2, nalphaprime2) = build_tree(
                    thetaplus, rplus, gradplus, v, j - 1, epsilon,
                    invmassmatrix, f, joint0)

            if betaprime + betaprime2 > 0 and \
                    np.random.uniform() < betaprime2 / (betaprime + betaprime2):
                thetaprime = thetaprime2[:]
                gradprime = gradprime2[:]
                logpprime = logpprime2
                extraprime = extraprime2
                rprime = rprime2

            sturn = stop_criterion(thetaminus, thetaplus, rminus, rplus)
            sprime = sprime and sprime2 and sturn
            alphaprime += alphaprime2
            betaprime += betaprime2
            nalphaprime += nalphaprime2

    return (thetaminus, rminus, gradminus, thetaplus, rplus, gradplus,
            thetaprime, gradprime, logpprime, extraprime, rprime, sprime,
            alphaprime, betaprime, nalphaprime)


def tree_sample(theta, logp, r0, grad, extra, epsilon, invmassmatrix, f,
                joint, maxheight=np.inf):
    """Sample from a dynamically doubled leapfrog trajectory."""
    thetaminus = theta
    thetaplus = theta
    rminus = r0[:]
    rplus = r0[:]
    gradminus = grad[:]
    gradplus = grad[:]
    alpha = 1
    beta = 1
    nalpha = 1

    j = 0
    s = True
    while s and j < maxheight:
        v = int(2 * (np.random.uniform() < 0.5) - 1)
        if v == -1:
            (thetaminus, rminus, gradminus, _, _, _, thetaprime, gradprime,
             logpprime, extraprime, rprime, sprime, alphaprime, betaprime,
             nalphaprime) = build_tree(
                thetaminus, rminus, gradminus, v, j, epsilon, invmassmatrix,
                f, joint)
        else:
            (_, _, _, thetaplus, rplus, gradplus, thetaprime, gradprime,
             logpprime, extraprime, rprime, sprime, alphaprime, betaprime,
             nalphaprime) = build_tree(
                thetaplus, rplus, gradplus, v, j, epsilon, invmassmatrix, f,
                joint)

        assert beta > 0, beta
        assert betaprime >= 0, betaprime

        if sprime and np.random.uniform() < betaprime / (beta + betaprime):
            logp = logpprime
            grad = gradprime[:]
            theta = thetaprime
            extra = extraprime
            r0 = rprime

        alpha += alphaprime
        beta += betaprime
        nalpha += nalphaprime

        sturn = stop_criterion(thetaminus, thetaplus, rminus, rplus)
        s = sprime and sturn
        j += 1
    return alpha, beta, nalpha, theta, grad, logp, extra, r0, j


def find_beta_params_static(d, u10):
    """Auxiliary beta parameters: 50% quantile at u=0.1, flat at high u."""
    del d
    betas = np.arange(1, 20)
    z50 = scipy.special.betaincinv(1.0, betas, 0.5)
    alpha = 1
    beta = np.interp(u10, z50[::-1], betas[::-1])
    return alpha, beta


def find_beta_params_dynamic(d, u10):
    """Auxiliary beta parameters accounting for d-dimensional kinetic energy."""
    import scipy.optimize
    u50 = (u10 + 1) / 2.0

    def minfunc(params):
        alpha, beta = params
        q10 = scipy.special.betainc(alpha, beta, u10)
        q50 = scipy.special.betainc(alpha, beta, u50)
        return (q10 - np.exp(-d / 2))**2 + (q50 - 0.98)**2

    r = scipy.optimize.minimize(minfunc, [1.0, 10.0])
    alpha, beta = r.x
    return alpha, beta


def generate_momentum_normal(d, massmatrix):
    """Draw momentum according to the mass matrix."""
    return np.random.multivariate_normal(np.zeros(d),
                                         np.dot(massmatrix, np.eye(d)))


def generate_momentum(d, massmatrix, alpha, beta):
    """Draw momentum from a circle with beta-distributed amplitude."""
    momentum = np.random.multivariate_normal(np.zeros(d),
                                             np.dot(massmatrix, np.eye(d)))
    betainc = scipy.special.betainc
    auxnorm = -betainc(alpha + 1, beta, 1) + betainc(alpha + 1, beta, 0) \
        + betainc(alpha, beta, 1)
    u = np.random.uniform()
    if u > 0.9:
        norm = 1.0
    else:
        u /= 0.9
        norm = betainc(alpha, beta, u)
    momnorm = -np.log((norm + 1e-10) / auxnorm)
    assert momnorm >= 0, (momnorm, norm, auxnorm)
    momentum *= momnorm / (momentum**2).sum() ** 0.5
    return momentum


def generate_momentum_circle(d, massmatrix):
    """Draw momentum from a circle with jittered amplitude."""
    momentum = np.random.multivariate_normal(np.zeros(d),
                                             np.dot(massmatrix, np.eye(d)))
    momentum *= 10 ** np.random.uniform(-0.3, 0.3) \
        / (momentum**2).sum() ** 0.5
    return momentum


def generate_momentum_flattened(d, massmatrix):
    """Normal momentum flattened to near-unit amplitude (the default)."""
    momentum = np.random.multivariate_normal(np.zeros(d),
                                             np.dot(massmatrix, np.eye(d)))
    norm = (momentum**2).sum() ** 0.5
    assert norm > 0
    momentum *= norm ** (1 / d) / norm
    return momentum


class FlattenedProblem:
    """Beta-CDF auxiliary surface over the likelihood for HMC.

    Maps logL to p = BetaCDF((L - Lmin)/(L90 - Lmin)); exposes
    ``__call__(u) -> ((logp, grad_aux), (p, L, grad))`` and momentum
    generation with mass matrices from the region whitening layer.
    """

    def __init__(self, d, Ls, function, layer):
        """Build the auxiliary surface from live-point likelihoods *Ls*."""
        self.Lmin = Ls.min()
        self.L90 = np.percentile(Ls, 90)
        self.L10 = np.percentile(Ls, 10)

        self.function = function
        self.layer = layer
        self.alpha, self.beta = 1.0, 6.0
        self.du_dL = 1 / (self.L90 - self.Lmin)
        self.C = scipy.special.beta(self.alpha, self.beta)
        self.d = d

        if hasattr(self.layer, 'invT'):
            self.invmassmatrix = self.layer.cov
            self.massmatrix = np.linalg.inv(self.invmassmatrix)
        elif hasattr(self.layer, 'std'):
            if np.shape(self.layer.std) == () and self.layer.std == 1:
                self.massmatrix = 1
                self.invmassmatrix = 1
            else:
                self.invmassmatrix = np.diag(self.layer.std[0] ** 2)
                self.massmatrix = np.diag(self.layer.std[0] ** -2)
        else:
            raise AssertionError(self.layer)

    def modify_Lgrad(self, L, grad):
        """Convert (logL, grad) to the auxiliary surface equivalents."""
        u = (L - self.Lmin) / (self.L90 - self.Lmin)
        if u <= 0:
            logp = -np.inf
            u = 0.0
            dlogp_du = 1.0
        elif u > 1:
            return 0.0, 0 * grad
        else:
            p = scipy.special.betainc(self.alpha, self.beta, u)
            logp = np.log(p)
            B = p * self.C
            dlogp_du = u ** (self.alpha - 1) * (1 - u) ** (self.beta - 1) / B
        tgrad = grad * dlogp_du * self.du_dL
        return logp, tgrad

    def __call__(self, u):
        """Evaluate at *u*: ((logp_aux, grad_aux), (p, L, grad))."""
        if not np.logical_and(u > 0, u < 1).all():
            return (-np.inf, 0.0 * u), (None, -np.inf, 0.0 * u)
        p, L, grad_orig = self.function(u)
        return self.modify_Lgrad(L, grad_orig), (p, L, grad_orig)

    def generate_momentum(self):
        """Draw a momentum vector for a new trajectory."""
        return generate_momentum_flattened(self.d, self.massmatrix)


class DynamicHMCSampler:
    """Dynamic HMC on a flattened likelihood surface.

    Trajectories orbit the likelihood contour using gradient guidance on
    the beta-flattened surface; samples are drawn with 1/p bias so the
    prior is sampled uniformly above the threshold. NUTS doubling sets
    the trajectory length; the step size targets acceptance rate *delta*.
    """

    def __init__(self, ndim, nsteps, transform_loglike_gradient, delta=0.90,
                 nudge=1.04):
        """Initialise.

        Parameters
        ----------
        ndim: int
            dimensionality
        nsteps: int
            accepted steps per independent sample
        transform_loglike_gradient: function
            u -> (p, logL, dlogL/du); with JAX models use
            :func:`transform_loglike_gradient_from_jax`
        delta: float
            target acceptance rate
        nudge: float
            step size adjustment factor (> 1)
        """
        self.history = []
        self.nsteps = nsteps
        self.nrejects = 0
        self.scale = 0.1 * ndim ** 0.5
        self.last = None, None, None, None
        self.transform_loglike_gradient = transform_loglike_gradient
        self.nudge = nudge
        self.delta = delta
        self.problem = None

        self.logstat = []
        self.logstat_labels = ['acceptance_rate', 'acceptance_rate_bias',
                               'stepsize', 'treeheight']
        self.logstat_trajectory = []

    def __str__(self):
        """Get string representation."""
        return type(self).__name__ + '(nsteps=%d)' % self.nsteps

    def plot(self, filename):
        """Plot sampler statistics to *filename*."""
        if len(self.logstat) == 0:
            return
        import matplotlib.pyplot as plt
        parts = np.transpose(self.logstat)
        plt.figure(figsize=(10, 1 + 3 * len(parts)))
        for i, (label, part) in enumerate(zip(self.logstat_labels, parts)):
            plt.subplot(len(parts), 1, 1 + i)
            plt.ylabel(label)
            plt.plot(part)
            if np.min(part) > 0:
                plt.yscale('log')
        plt.savefig(filename, bbox_inches='tight')
        plt.close()

    def __next__(self, region, Lmin, us, Ls, transform, loglike, ndraw=40,
                 plot=False, tregion=None):
        """Run nsteps HMC trajectories; return the final point."""
        mask = Ls > Lmin
        i = np.random.randint(mask.sum())
        self.starti = np.where(mask)[0][i]
        ui = us[mask, :][i]
        assert np.logical_and(ui > 0, ui < 1).all(), ui

        if self.problem is None:
            self.create_problem(Ls, region)

        ncalls_total = 1
        (Lflat, gradflat), (pi, Li, gradi) = self.problem(ui)
        assert np.shape(Lflat) == (), (Lflat, Li, gradi)
        assert np.shape(gradflat) == (len(ui),), (gradi, gradflat)

        nsteps_remaining = self.nsteps
        while nsteps_remaining > 0:
            (unew, pnew, Lnew, gradnew, Lflatnew, gradflatnew, nc, alpha,
             beta, treeheight) = self.move(
                ui, pi, Li, gradi, gradflat=gradflat, Lflat=Lflat,
                region=region, ndraw=ndraw, plot=plot)
            if treeheight > 1:
                nsteps_remaining = nsteps_remaining - 1
            ncalls_total += nc
            assert np.logical_and(unew > 0, unew < 1).all(), unew
            ui, pi, Li, gradi, Lflat, gradflat = \
                unew, pnew, Lnew, gradnew, Lflatnew, gradflatnew
            self.logstat_trajectory.append([alpha, beta, treeheight])

        self.adjust_stepsize()
        return unew, pnew, Lnew, ncalls_total

    def move(self, ui, pi, Li, gradi, region, ndraw=1, Lflat=None,
             gradflat=None, plot=False):
        """One dynamically doubled HMC trajectory from (ui, Li, gradi)."""
        epsilon = self.scale
        epsilon_here = np.random.uniform() * epsilon
        problem = self.problem
        d = len(ui)
        assert Li > problem.Lmin

        if Lflat is None or gradflat is None:
            Lflat, gradflat = problem.modify_Lgrad(Li, gradi)
        assert np.shape(Lflat) == (), (Lflat, Li, gradi)
        assert np.shape(gradflat) == (d,), (gradi, gradflat)

        momentum = problem.generate_momentum()
        joint0 = Lflat - 0.5 * np.dot(
            np.dot(momentum, problem.invmassmatrix), momentum.T)
        assert np.isfinite(joint0), (Lflat, momentum)

        (alpha, beta, nalpha, theta, gradflat, Lflat,
         (pnew, Lnew, gradnew), rprime, treeheight) = tree_sample(
            ui, Lflat, momentum, gradflat, (pi, Li, gradi), epsilon_here,
            problem.invmassmatrix, problem, joint0, maxheight=30)

        return (theta, pnew, Lnew, gradnew, Lflat, gradflat, nalpha,
                alpha / nalpha, beta / nalpha, treeheight)

    def create_problem(self, Ls, region):
        """Set up the auxiliary distribution from the live points."""
        d = len(region.u[0])
        self.problem = FlattenedProblem(
            d, Ls, self.transform_loglike_gradient, region.transformLayer)

    def adjust_stepsize(self):
        """Aggregate trajectory statistics and adapt the step size."""
        if len(self.logstat_trajectory) == 0:
            return
        self.logstat.append([
            np.mean([a for a, b, th in self.logstat_trajectory]),
            float(self.scale),
            np.mean([b for a, b, th in self.logstat_trajectory]),
            np.mean([th for a, b, th in self.logstat_trajectory]),
        ])
        if any(th <= 1 for a, b, th in self.logstat_trajectory):
            # stuck somewhere: finer steps needed
            self.scale /= self.nudge
        elif all(2**th > 10 for a, b, th in self.logstat_trajectory):
            self.scale *= self.nudge ** (1.0 / 40)
        else:
            alphamean = self.logstat[-1][0]
            if alphamean < self.delta:
                self.scale /= self.nudge
            elif alphamean > self.delta:
                self.scale *= self.nudge
        self.logstat_trajectory = []

    def region_changed(self, Ls, region):
        """React to a region rebuild: adapt stepsize and rebuild surface."""
        self.adjust_stepsize()
        self.create_problem(Ls, region)
