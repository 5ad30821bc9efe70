// Naive CBLAS implementations backing the oracle build's cblas.h stub.
// Only the row-major paths the reference's math_functions.cpp exercises are
// supported (caffe_cpu_gemm/gemv always pass CblasRowMajor). Workloads are
// fixture-sized, so straightforward loops are fine.
#include "cblas.h"

#include <cstdlib>

namespace {

// Row-major GEMM: C[M,N] = alpha * op(A)[M,K] * op(B)[K,N] + beta * C.
template <typename T>
void gemm(const CBLAS_TRANSPOSE TransA, const CBLAS_TRANSPOSE TransB,
          const int M, const int N, const int K, const T alpha, const T* A,
          const int lda, const T* B, const int ldb, const T beta, T* C,
          const int ldc) {
  for (int m = 0; m < M; ++m) {
    for (int n = 0; n < N; ++n) {
      T acc = 0;
      for (int k = 0; k < K; ++k) {
        const T a = (TransA == CblasNoTrans) ? A[m * lda + k] : A[k * lda + m];
        const T b = (TransB == CblasNoTrans) ? B[k * ldb + n] : B[n * ldb + k];
        acc += a * b;
      }
      C[m * ldc + n] = alpha * acc + beta * C[m * ldc + n];
    }
  }
}

// Row-major GEMV: y = alpha * op(A) * x + beta * y.
template <typename T>
void gemv(const CBLAS_TRANSPOSE TransA, const int M, const int N, const T alpha,
          const T* A, const int lda, const T* x, const int incx, const T beta,
          T* y, const int incy) {
  const int out_dim = (TransA == CblasNoTrans) ? M : N;
  const int in_dim = (TransA == CblasNoTrans) ? N : M;
  for (int o = 0; o < out_dim; ++o) {
    T acc = 0;
    for (int i = 0; i < in_dim; ++i) {
      const T a = (TransA == CblasNoTrans) ? A[o * lda + i] : A[i * lda + o];
      acc += a * x[i * incx];
    }
    y[o * incy] = alpha * acc + beta * y[o * incy];
  }
}

}  // namespace

extern "C" {

void cblas_sgemm(const CBLAS_ORDER Order, const CBLAS_TRANSPOSE TransA,
                 const CBLAS_TRANSPOSE TransB, const int M, const int N,
                 const int K, const float alpha, const float* A, const int lda,
                 const float* B, const int ldb, const float beta, float* C,
                 const int ldc) {
  if (Order != CblasRowMajor) std::abort();
  gemm(TransA, TransB, M, N, K, alpha, A, lda, B, ldb, beta, C, ldc);
}

void cblas_dgemm(const CBLAS_ORDER Order, const CBLAS_TRANSPOSE TransA,
                 const CBLAS_TRANSPOSE TransB, const int M, const int N,
                 const int K, const double alpha, const double* A, const int lda,
                 const double* B, const int ldb, const double beta, double* C,
                 const int ldc) {
  if (Order != CblasRowMajor) std::abort();
  gemm(TransA, TransB, M, N, K, alpha, A, lda, B, ldb, beta, C, ldc);
}

void cblas_sgemv(const CBLAS_ORDER Order, const CBLAS_TRANSPOSE TransA,
                 const int M, const int N, const float alpha, const float* A,
                 const int lda, const float* x, const int incx, const float beta,
                 float* y, const int incy) {
  if (Order != CblasRowMajor) std::abort();
  gemv(TransA, M, N, alpha, A, lda, x, incx, beta, y, incy);
}

void cblas_dgemv(const CBLAS_ORDER Order, const CBLAS_TRANSPOSE TransA,
                 const int M, const int N, const double alpha, const double* A,
                 const int lda, const double* x, const int incx,
                 const double beta, double* y, const int incy) {
  if (Order != CblasRowMajor) std::abort();
  gemv(TransA, M, N, alpha, A, lda, x, incx, beta, y, incy);
}

void cblas_saxpy(const int N, const float alpha, const float* X, const int incX,
                 float* Y, const int incY) {
  for (int i = 0; i < N; ++i) Y[i * incY] += alpha * X[i * incX];
}

void cblas_daxpy(const int N, const double alpha, const double* X,
                 const int incX, double* Y, const int incY) {
  for (int i = 0; i < N; ++i) Y[i * incY] += alpha * X[i * incX];
}

void cblas_sscal(const int N, const float alpha, float* X, const int incX) {
  for (int i = 0; i < N; ++i) X[i * incX] *= alpha;
}

void cblas_dscal(const int N, const double alpha, double* X, const int incX) {
  for (int i = 0; i < N; ++i) X[i * incX] *= alpha;
}

void cblas_scopy(const int N, const float* X, const int incX, float* Y,
                 const int incY) {
  for (int i = 0; i < N; ++i) Y[i * incY] = X[i * incX];
}

void cblas_dcopy(const int N, const double* X, const int incX, double* Y,
                 const int incY) {
  for (int i = 0; i < N; ++i) Y[i * incY] = X[i * incX];
}

float cblas_sdot(const int N, const float* X, const int incX, const float* Y,
                 const int incY) {
  // Accumulate in double like real BLAS libraries tend to; callers compare
  // against tolerance anyway.
  double acc = 0;
  for (int i = 0; i < N; ++i) acc += static_cast<double>(X[i * incX]) * Y[i * incY];
  return static_cast<float>(acc);
}

double cblas_ddot(const int N, const double* X, const int incX, const double* Y,
                  const int incY) {
  double acc = 0;
  for (int i = 0; i < N; ++i) acc += X[i * incX] * Y[i * incY];
  return acc;
}

float cblas_sasum(const int N, const float* X, const int incX) {
  double acc = 0;
  for (int i = 0; i < N; ++i) acc += (X[i * incX] >= 0 ? X[i * incX] : -X[i * incX]);
  return static_cast<float>(acc);
}

double cblas_dasum(const int N, const double* X, const int incX) {
  double acc = 0;
  for (int i = 0; i < N; ++i) acc += (X[i * incX] >= 0 ? X[i * incX] : -X[i * incX]);
  return acc;
}

}  // extern "C"
