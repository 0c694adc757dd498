/* Compile-only g2o stand-in (see ../../core/sparse_optimizer.h). */
#ifndef SHIM_G2O_SOLVERS_CHOLMOD_LINEAR_SOLVER_CHOLMOD_H
#define SHIM_G2O_SOLVERS_CHOLMOD_LINEAR_SOLVER_CHOLMOD_H

namespace g2o {

template <typename MatrixType>
class LinearSolverCholmod
{
public:
    void setBlockOrdering(bool) { }
    void setWriteDebug(bool) { }
};

} /* namespace g2o */

#endif
