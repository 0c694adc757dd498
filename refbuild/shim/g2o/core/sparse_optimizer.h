/* Compile-only g2o stand-in. The head-to-head harness always selects the
 * reference's own LM optimizer ("PoseGraphOptimizerType": "LM"), so none of
 * these methods execute; calling Optimize on the shim aborts loudly. */
#ifndef SHIM_G2O_CORE_SPARSE_OPTIMIZER_H
#define SHIM_G2O_CORE_SPARSE_OPTIMIZER_H

#include <cstdlib>
#include <iostream>
#include <map>
#include <memory>
#include <vector>

#include <Eigen/Core>

namespace g2o {

[[noreturn]] inline void ShimUnavailable(const char* what)
{
    std::cerr << "g2o shim: " << what << " is not available in this build; "
              << "select the LM pose-graph optimizer instead" << std::endl;
    std::abort();
}

class OptimizationAlgorithm;
class HyperGraphAction;

class HyperGraph
{
public:
    class Vertex
    {
    public:
        virtual ~Vertex() = default;
        void setId(const int id) { mId = id; }
        int id() const { return mId; }

    private:
        int mId = -1;
    };

    class Edge
    {
    public:
        virtual ~Edge() = default;
        std::vector<Vertex*>& vertices() { return mVertices; }

    protected:
        std::vector<Vertex*> mVertices;
    };
};

class SparseOptimizer
{
public:
    ~SparseOptimizer()
    {
        this->clear();
        delete this->mAlgorithm;
    }

    void clear()
    {
        for (auto& [id, pVertex] : this->mVertices)
            delete pVertex;
        for (auto* pEdge : this->mEdges)
            delete pEdge;
        this->mVertices.clear();
        this->mEdges.clear();
    }

    void clearParameters() { }

    bool addVertex(HyperGraph::Vertex* pVertex)
    {
        this->mVertices[pVertex->id()] = pVertex;
        return true;
    }

    bool addEdge(HyperGraph::Edge* pEdge)
    {
        this->mEdges.push_back(pEdge);
        return true;
    }

    HyperGraph::Vertex* vertex(const int id)
    {
        const auto it = this->mVertices.find(id);
        return it != this->mVertices.end() ? it->second : nullptr;
    }

    bool initializeOptimization() { return true; }
    double chi2() const { ShimUnavailable("SparseOptimizer::chi2"); }
    int optimize(int) { ShimUnavailable("SparseOptimizer::optimize"); }

    void setAlgorithm(OptimizationAlgorithm* pAlgorithm)
    {
        this->mAlgorithm = pAlgorithm;
    }

    void setVerbose(bool) { }
    void addPostIterationAction(HyperGraphAction*) { }

private:
    std::map<int, HyperGraph::Vertex*> mVertices;
    std::vector<HyperGraph::Edge*> mEdges;
    OptimizationAlgorithm* mAlgorithm = nullptr;
};

} /* namespace g2o */

#endif
