/* Vectorized likelihood + transform in C, for use via ctypes.
 *
 * Build:  make  (produces mylib.so)
 *
 * The framework calls these with whole batches of points, so the C side
 * can use OpenMP/SIMD freely. Model: 3-d gaussian centered at
 * (0.4, 0.5, 0.6) with sigma 0.1, prior scaled to (-1, 1).
 */
#include <math.h>
#include <stddef.h>

void my_c_transform_vectorized(double *cube, size_t ndim, size_t npoints) {
    for (size_t i = 0; i < npoints * ndim; i++) {
        cube[i] = cube[i] * 2.0 - 1.0;
    }
}

void my_c_likelihood_vectorized(const double *params, size_t ndim,
                                size_t npoints, double *like) {
    const double sigma = 0.1;
    for (size_t j = 0; j < npoints; j++) {
        double chi2 = 0.0;
        for (size_t k = 0; k < ndim; k++) {
            double center = 0.4 + 0.1 * (double)k - 0.5;  /* in (-1,1) space */
            double d = (params[j * ndim + k] - center) / sigma;
            chi2 += d * d;
        }
        like[j] = -0.5 * chi2
            - 0.5 * (double)ndim * log(2.0 * M_PI * sigma * sigma);
    }
}

/* scalar (one point per call) variants for runcsimple.py */
void my_c_transform(double *cube, size_t ndim) {
    my_c_transform_vectorized(cube, ndim, 1);
}

double my_c_likelihood(const double *params, size_t ndim) {
    double like;
    my_c_likelihood_vectorized(params, ndim, 1, &like);
    return like;
}
