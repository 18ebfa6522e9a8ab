! Vectorized likelihood in Fortran, for use via ctypes.
!
! Build:  make  (produces myfortlib.so)
module mymodule
  use iso_c_binding
  implicit none
contains

  subroutine my_f_likelihood_vectorized(params, ndim, npoints, like) &
      bind(c, name='my_f_likelihood_vectorized')
    integer(c_size_t), value :: ndim, npoints
    real(c_double), intent(in) :: params(ndim, npoints)
    real(c_double), intent(out) :: like(npoints)
    real(c_double), parameter :: sigma = 0.1d0
    real(c_double), parameter :: pi = 3.14159265358979323846d0
    integer(c_size_t) :: j

    do j = 1, npoints
      like(j) = -0.5d0 * sum(((params(:, j) - 0.5d0) / sigma)**2) &
                - 0.5d0 * ndim * log(2d0 * pi * sigma**2)
    end do
  end subroutine

end module
