/* Minimal CBLAS interface for the oracle build. The container ships no BLAS
 * dev headers; the reference's math_functions.cpp only needs these entry
 * points. Naive reference implementations live in
 * native/oracle/support/cblas_naive.cc — fixture workloads are tiny, so
 * performance is irrelevant; correctness follows the BLAS contract.
 */
#ifndef ORACLE_STUB_CBLAS_H_
#define ORACLE_STUB_CBLAS_H_

#ifdef __cplusplus
extern "C" {
#endif

typedef enum CBLAS_ORDER { CblasRowMajor = 101, CblasColMajor = 102 } CBLAS_ORDER;
typedef enum CBLAS_TRANSPOSE {
  CblasNoTrans = 111,
  CblasTrans = 112,
  CblasConjTrans = 113
} CBLAS_TRANSPOSE;

void cblas_sgemm(const enum CBLAS_ORDER Order, const enum CBLAS_TRANSPOSE TransA,
                 const enum CBLAS_TRANSPOSE TransB, const int M, const int N,
                 const int K, const float alpha, const float* A, const int lda,
                 const float* B, const int ldb, const float beta, float* C,
                 const int ldc);
void cblas_dgemm(const enum CBLAS_ORDER Order, const enum CBLAS_TRANSPOSE TransA,
                 const enum CBLAS_TRANSPOSE TransB, const int M, const int N,
                 const int K, const double alpha, const double* A, const int lda,
                 const double* B, const int ldb, const double beta, double* C,
                 const int ldc);

void cblas_sgemv(const enum CBLAS_ORDER Order, const enum CBLAS_TRANSPOSE TransA,
                 const int M, const int N, const float alpha, const float* A,
                 const int lda, const float* x, const int incx, const float beta,
                 float* y, const int incy);
void cblas_dgemv(const enum CBLAS_ORDER Order, const enum CBLAS_TRANSPOSE TransA,
                 const int M, const int N, const double alpha, const double* A,
                 const int lda, const double* x, const int incx,
                 const double beta, double* y, const int incy);

void cblas_saxpy(const int N, const float alpha, const float* X, const int incX,
                 float* Y, const int incY);
void cblas_daxpy(const int N, const double alpha, const double* X,
                 const int incX, double* Y, const int incY);

void cblas_sscal(const int N, const float alpha, float* X, const int incX);
void cblas_dscal(const int N, const double alpha, double* X, const int incX);

void cblas_scopy(const int N, const float* X, const int incX, float* Y,
                 const int incY);
void cblas_dcopy(const int N, const double* X, const int incX, double* Y,
                 const int incY);

float cblas_sdot(const int N, const float* X, const int incX, const float* Y,
                 const int incY);
double cblas_ddot(const int N, const double* X, const int incX, const double* Y,
                  const int incY);

float cblas_sasum(const int N, const float* X, const int incX);
double cblas_dasum(const int N, const double* X, const int incX);

#ifdef __cplusplus
}
#endif

#endif /* ORACLE_STUB_CBLAS_H_ */
