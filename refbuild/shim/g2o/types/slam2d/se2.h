/* Compile-only g2o stand-in (see ../../core/sparse_optimizer.h). */
#ifndef SHIM_G2O_TYPES_SLAM2D_SE2_H
#define SHIM_G2O_TYPES_SLAM2D_SE2_H

#include <Eigen/Core>
#include <Eigen/Geometry>

namespace g2o {

class SE2
{
public:
    SE2() : mTranslation(0.0, 0.0), mRotation(0.0) { }
    explicit SE2(const Eigen::Vector3d& pose) :
        mTranslation(pose[0], pose[1]), mRotation(pose[2]) { }

    const Eigen::Vector2d& translation() const { return this->mTranslation; }
    const Eigen::Rotation2Dd& rotation() const { return this->mRotation; }

private:
    Eigen::Vector2d mTranslation;
    Eigen::Rotation2Dd mRotation;
};

} /* namespace g2o */

#endif
