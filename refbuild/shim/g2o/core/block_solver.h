/* Compile-only g2o stand-in (see sparse_optimizer.h). */
#ifndef SHIM_G2O_CORE_BLOCK_SOLVER_H
#define SHIM_G2O_CORE_BLOCK_SOLVER_H

#include <memory>

#include <Eigen/Core>

namespace g2o {

template <typename LinearSolverT>
class BlockSolverBase
{
public:
    using PoseMatrixType = Eigen::MatrixXd;

    explicit BlockSolverBase(std::unique_ptr<LinearSolverT>) { }
    void setWriteDebug(bool) { }
};

class BlockSolverX
{
public:
    using PoseMatrixType = Eigen::MatrixXd;

    template <typename LinearSolverT>
    explicit BlockSolverX(std::unique_ptr<LinearSolverT>) { }
    void setWriteDebug(bool) { }
};

} /* namespace g2o */

#endif
