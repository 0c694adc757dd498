/* Compile-only g2o stand-in (see sparse_optimizer.h). */
#ifndef SHIM_G2O_CORE_SPARSE_OPTIMIZER_TERMINATE_ACTION_H
#define SHIM_G2O_CORE_SPARSE_OPTIMIZER_TERMINATE_ACTION_H

namespace g2o {

class HyperGraphAction
{
public:
    virtual ~HyperGraphAction() = default;
};

class SparseOptimizerTerminateAction : public HyperGraphAction
{
public:
    void setMaxIterations(int) { }
    void setGainThreshold(double) { }
};

} /* namespace g2o */

#endif
