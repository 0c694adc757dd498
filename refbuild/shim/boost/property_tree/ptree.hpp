/* Minimal boost::property_tree::ptree stand-in so the reference
 * implementation compiles without Boost. Implements exactly the surface the
 * reference uses: get<T>(path), get_child(path), put(path, v),
 * push_back(pair), add_child(path, tree), ordered children, '.'-separated
 * paths. Values are stored as strings (as boost's JSON ptree does).
 */
#ifndef SHIM_BOOST_PROPERTY_TREE_PTREE_HPP
#define SHIM_BOOST_PROPERTY_TREE_PTREE_HPP

#include <cstdint>
#include <limits>
#include <sstream>
#include <stdexcept>
#include <string>
#include <utility>
#include <vector>

namespace boost {
namespace property_tree {

class ptree_error : public std::runtime_error
{
public:
    explicit ptree_error(const std::string& what) :
        std::runtime_error(what) { }
};

class ptree_bad_path : public ptree_error
{
public:
    explicit ptree_bad_path(const std::string& path) :
        ptree_error("No such node: " + path) { }
};

class ptree_bad_data : public ptree_error
{
public:
    explicit ptree_bad_data(const std::string& data) :
        ptree_error("Conversion failed: " + data) { }
};

namespace detail {

template <typename T>
inline T StringToValue(const std::string& str)
{
    std::istringstream strStream { str };
    T value;
    strStream >> value;
    if (strStream.fail())
        throw ptree_bad_data(str);
    return value;
}

template <>
inline std::string StringToValue<std::string>(const std::string& str)
{
    return str;
}

template <>
inline bool StringToValue<bool>(const std::string& str)
{
    if (str == "true" || str == "1")
        return true;
    if (str == "false" || str == "0")
        return false;
    throw ptree_bad_data(str);
}

template <typename T>
inline std::string ValueToString(const T& value)
{
    std::ostringstream strStream;
    strStream.precision(std::numeric_limits<long double>::max_digits10);
    strStream << value;
    return strStream.str();
}

inline std::string ValueToString(const bool value)
{
    return value ? "true" : "false";
}

inline std::string ValueToString(const std::string& value) { return value; }
inline std::string ValueToString(const char* value)
{
    return std::string(value);
}

} /* namespace detail */

class ptree
{
public:
    using value_type = std::pair<std::string, ptree>;
    using children_type = std::vector<value_type>;
    using iterator = children_type::iterator;
    using const_iterator = children_type::const_iterator;

    ptree() = default;
    explicit ptree(const std::string& data) : mData(data) { }

    iterator begin() { return this->mChildren.begin(); }
    iterator end() { return this->mChildren.end(); }
    const_iterator begin() const { return this->mChildren.begin(); }
    const_iterator end() const { return this->mChildren.end(); }
    std::size_t size() const { return this->mChildren.size(); }
    bool empty() const { return this->mChildren.empty(); }

    const std::string& data() const { return this->mData; }
    std::string& data() { return this->mData; }

    children_type& children() { return this->mChildren; }
    const children_type& children() const { return this->mChildren; }

    /* Find a direct child by key (first match, as boost does) */
    ptree* find_child(const std::string& key)
    {
        for (auto& [childKey, child] : this->mChildren)
            if (childKey == key)
                return &child;
        return nullptr;
    }

    const ptree* find_child(const std::string& key) const
    {
        for (const auto& [childKey, child] : this->mChildren)
            if (childKey == key)
                return &child;
        return nullptr;
    }

    const ptree& get_child(const std::string& path) const
    {
        const ptree* pNode = this->WalkPath(path);
        if (pNode == nullptr)
            throw ptree_bad_path(path);
        return *pNode;
    }

    ptree& get_child(const std::string& path)
    {
        return const_cast<ptree&>(
            static_cast<const ptree*>(this)->get_child(path));
    }

    template <typename T>
    T get(const std::string& path) const
    {
        return detail::StringToValue<T>(this->get_child(path).mData);
    }

    template <typename T>
    T get(const std::string& path, const T& defaultValue) const
    {
        const ptree* pNode = this->WalkPath(path);
        if (pNode == nullptr)
            return defaultValue;
        return detail::StringToValue<T>(pNode->mData);
    }

    std::string get(const std::string& path, const char* defaultValue) const
    {
        return this->get<std::string>(path, std::string(defaultValue));
    }

    template <typename T>
    ptree& put(const std::string& path, const T& value)
    {
        ptree& node = this->EnsurePath(path);
        node.mData = detail::ValueToString(value);
        return node;
    }

    ptree& put_child(const std::string& path, const ptree& child)
    {
        ptree& node = this->EnsurePath(path);
        node = child;
        return node;
    }

    /* boost semantics: always append a NEW child at the final path key */
    ptree& add_child(const std::string& path, const ptree& child)
    {
        const std::size_t lastDot = path.rfind('.');
        ptree& parent = (lastDot == std::string::npos) ?
            *this : this->EnsurePath(path.substr(0, lastDot));
        const std::string key = (lastDot == std::string::npos) ?
            path : path.substr(lastDot + 1);
        parent.mChildren.emplace_back(key, child);
        return parent.mChildren.back().second;
    }

    void push_back(const value_type& value)
    {
        this->mChildren.push_back(value);
    }

private:
    const ptree* WalkPath(const std::string& path) const
    {
        const ptree* pNode = this;
        std::size_t begin = 0;
        while (begin <= path.size()) {
            const std::size_t dot = path.find('.', begin);
            const std::string key = (dot == std::string::npos) ?
                path.substr(begin) : path.substr(begin, dot - begin);
            pNode = pNode->find_child(key);
            if (pNode == nullptr)
                return nullptr;
            if (dot == std::string::npos)
                break;
            begin = dot + 1;
        }
        return pNode;
    }

    ptree& EnsurePath(const std::string& path)
    {
        ptree* pNode = this;
        std::size_t begin = 0;
        while (begin <= path.size()) {
            const std::size_t dot = path.find('.', begin);
            const std::string key = (dot == std::string::npos) ?
                path.substr(begin) : path.substr(begin, dot - begin);
            ptree* pChild = pNode->find_child(key);
            if (pChild == nullptr) {
                pNode->mChildren.emplace_back(key, ptree());
                pChild = &pNode->mChildren.back().second;
            }
            pNode = pChild;
            if (dot == std::string::npos)
                break;
            begin = dot + 1;
        }
        return *pNode;
    }

    std::string mData;
    children_type mChildren;
};

} /* namespace property_tree */
} /* namespace boost */

#endif
