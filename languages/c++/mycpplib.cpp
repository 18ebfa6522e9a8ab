// Vectorized likelihood + transform in C++, for use via ctypes.
//
// Build:  make  (produces mycpplib.so)
//
// Model: 3-d gaussian shell of radius 0.4 around the cube center.
#include <cmath>
#include <cstddef>

extern "C" {

void my_cpp_transform_vectorized(double *cube, size_t ndim,
                                 size_t npoints) {
    // identity transform: prior is the unit cube
    (void)cube;
    (void)ndim;
    (void)npoints;
}

void my_cpp_likelihood_vectorized(const double *params, size_t ndim,
                                  size_t npoints, double *like) {
    const double r0 = 0.4;
    const double w = 0.02;
    for (size_t j = 0; j < npoints; j++) {
        double r2 = 0.0;
        for (size_t k = 0; k < ndim; k++) {
            double d = params[j * ndim + k] - 0.5;
            r2 += d * d;
        }
        double r = std::sqrt(r2);
        double z = (r - r0) / w;
        like[j] = -0.5 * z * z - 0.5 * std::log(2.0 * M_PI * w * w);
    }
}

}  // extern "C"
// scalar (one point per call) variants for runcppsimple.py
extern "C" {

void my_cpp_transform(double *cube, size_t ndim) {
    my_cpp_transform_vectorized(cube, ndim, 1);
}

double my_cpp_likelihood(const double *params, size_t ndim) {
    double like;
    my_cpp_likelihood_vectorized(params, ndim, 1, &like);
    return like;
}

}  // extern "C"
