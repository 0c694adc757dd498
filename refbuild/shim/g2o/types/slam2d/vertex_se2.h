/* Compile-only g2o stand-in (see ../../core/sparse_optimizer.h). */
#ifndef SHIM_G2O_TYPES_SLAM2D_VERTEX_SE2_H
#define SHIM_G2O_TYPES_SLAM2D_VERTEX_SE2_H

#include "se2.h"
#include "../../core/sparse_optimizer.h"

namespace g2o {

class VertexSE2 : public HyperGraph::Vertex
{
public:
    void setEstimate(const SE2& estimate) { this->mEstimate = estimate; }
    const SE2& estimate() const { return this->mEstimate; }
    void setFixed(bool) { }

private:
    SE2 mEstimate;
};

} /* namespace g2o */

#endif
