/* Compile-only g2o stand-in (see ../../core/sparse_optimizer.h). */
#ifndef SHIM_G2O_TYPES_SLAM2D_EDGE_SE2_H
#define SHIM_G2O_TYPES_SLAM2D_EDGE_SE2_H

#include <Eigen/Core>

#include "se2.h"
#include "../../core/sparse_optimizer.h"

namespace g2o {

class EdgeSE2 : public HyperGraph::Edge
{
public:
    EdgeSE2() { this->mVertices.resize(2, nullptr); }

    void setMeasurement(const SE2& measurement)
    {
        this->mMeasurement = measurement;
    }

    void setInformation(const Eigen::Matrix3d& information)
    {
        this->mInformation = information;
    }

private:
    SE2 mMeasurement;
    Eigen::Matrix3d mInformation = Eigen::Matrix3d::Identity();
};

} /* namespace g2o */

#endif
