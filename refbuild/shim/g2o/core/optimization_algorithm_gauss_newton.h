/* Compile-only g2o stand-in (see sparse_optimizer.h). */
#ifndef SHIM_G2O_CORE_OPTIMIZATION_ALGORITHM_GAUSS_NEWTON_H
#define SHIM_G2O_CORE_OPTIMIZATION_ALGORITHM_GAUSS_NEWTON_H

#include <memory>

namespace g2o {

class OptimizationAlgorithm
{
public:
    virtual ~OptimizationAlgorithm() = default;
};

class OptimizationAlgorithmGaussNewton : public OptimizationAlgorithm
{
public:
    template <typename BlockSolverT>
    explicit OptimizationAlgorithmGaussNewton(
        std::unique_ptr<BlockSolverT>) { }
    void setWriteDebug(bool) { }
};

} /* namespace g2o */

#endif
