/* Minimal boost::property_tree::json_parser stand-in: read_json/write_json
 * over the shim ptree. Scalars are stored/emitted as strings, arrays are
 * children with empty keys — matching boost's JSON<->ptree mapping.
 */
#ifndef SHIM_BOOST_PROPERTY_TREE_JSON_PARSER_HPP
#define SHIM_BOOST_PROPERTY_TREE_JSON_PARSER_HPP

#include <cctype>
#include <fstream>
#include <ostream>
#include <string>

#include "ptree.hpp"

namespace boost {
namespace property_tree {

class json_parser_error : public ptree_error
{
public:
    explicit json_parser_error(const std::string& what) :
        ptree_error(what) { }

    std::string filename() const { return std::string(); }
    unsigned long line() const { return 0; }
};

namespace json_detail {

class Parser
{
public:
    Parser(const std::string& text) : mText(text), mPos(0) { }

    void Parse(ptree& root)
    {
        this->SkipSpace();
        this->ParseValue(root);
        this->SkipSpace();
        if (this->mPos != this->mText.size())
            this->Fail("trailing characters");
    }

private:
    [[noreturn]] void Fail(const std::string& message)
    {
        throw json_parser_error(
            "JSON parse error at offset " + std::to_string(this->mPos) +
            ": " + message);
    }

    void SkipSpace()
    {
        while (this->mPos < this->mText.size() &&
               std::isspace(static_cast<unsigned char>(
                   this->mText[this->mPos])))
            ++this->mPos;
    }

    char Peek()
    {
        if (this->mPos >= this->mText.size())
            this->Fail("unexpected end of input");
        return this->mText[this->mPos];
    }

    char Next()
    {
        const char c = this->Peek();
        ++this->mPos;
        return c;
    }

    void Expect(const char expected)
    {
        if (this->Next() != expected)
            this->Fail(std::string("expected '") + expected + "'");
    }

    std::string ParseString()
    {
        this->Expect('"');
        std::string out;
        while (true) {
            const char c = this->Next();
            if (c == '"')
                break;
            if (c == '\\') {
                const char esc = this->Next();
                switch (esc) {
                    case '"': out += '"'; break;
                    case '\\': out += '\\'; break;
                    case '/': out += '/'; break;
                    case 'b': out += '\b'; break;
                    case 'f': out += '\f'; break;
                    case 'n': out += '\n'; break;
                    case 'r': out += '\r'; break;
                    case 't': out += '\t'; break;
                    case 'u': {
                        unsigned int code = 0;
                        for (int i = 0; i < 4; ++i) {
                            const char h = this->Next();
                            code <<= 4;
                            if (h >= '0' && h <= '9') code |= h - '0';
                            else if (h >= 'a' && h <= 'f') code |= h - 'a' + 10;
                            else if (h >= 'A' && h <= 'F') code |= h - 'A' + 10;
                            else this->Fail("bad \\u escape");
                        }
                        /* ASCII only (settings files are ASCII) */
                        out += static_cast<char>(code & 0x7F);
                        break;
                    }
                    default: this->Fail("bad escape");
                }
            } else {
                out += c;
            }
        }
        return out;
    }

    void ParseValue(ptree& node)
    {
        this->SkipSpace();
        const char c = this->Peek();
        if (c == '{') {
            this->ParseObject(node);
        } else if (c == '[') {
            this->ParseArray(node);
        } else if (c == '"') {
            node.data() = this->ParseString();
        } else if (c == 't') {
            this->ParseLiteral("true");
            node.data() = "true";
        } else if (c == 'f') {
            this->ParseLiteral("false");
            node.data() = "false";
        } else if (c == 'n') {
            this->ParseLiteral("null");
            node.data() = "";
        } else {
            node.data() = this->ParseNumber();
        }
    }

    void ParseLiteral(const std::string& literal)
    {
        for (const char c : literal)
            if (this->Next() != c)
                this->Fail("bad literal");
    }

    std::string ParseNumber()
    {
        const std::size_t start = this->mPos;
        if (this->Peek() == '-' || this->Peek() == '+')
            ++this->mPos;
        while (this->mPos < this->mText.size()) {
            const char c = this->mText[this->mPos];
            if (std::isdigit(static_cast<unsigned char>(c)) ||
                c == '.' || c == 'e' || c == 'E' || c == '-' || c == '+')
                ++this->mPos;
            else
                break;
        }
        if (this->mPos == start)
            this->Fail("bad number");
        return this->mText.substr(start, this->mPos - start);
    }

    void ParseObject(ptree& node)
    {
        this->Expect('{');
        this->SkipSpace();
        if (this->Peek() == '}') { ++this->mPos; return; }
        while (true) {
            this->SkipSpace();
            const std::string key = this->ParseString();
            this->SkipSpace();
            this->Expect(':');
            ptree child;
            this->ParseValue(child);
            node.push_back(std::make_pair(key, child));
            this->SkipSpace();
            const char c = this->Next();
            if (c == '}')
                break;
            if (c != ',')
                this->Fail("expected ',' or '}'");
        }
    }

    void ParseArray(ptree& node)
    {
        this->Expect('[');
        this->SkipSpace();
        if (this->Peek() == ']') { ++this->mPos; return; }
        while (true) {
            ptree child;
            this->ParseValue(child);
            node.push_back(std::make_pair(std::string(), child));
            this->SkipSpace();
            const char c = this->Next();
            if (c == ']')
                break;
            if (c != ',')
                this->Fail("expected ',' or ']'");
        }
    }

    const std::string& mText;
    std::size_t mPos;
};

inline std::string EscapeJson(const std::string& str)
{
    std::string out;
    out.reserve(str.size() + 2);
    for (const char c : str) {
        switch (c) {
            case '"': out += "\\\""; break;
            case '\\': out += "\\\\"; break;
            case '\b': out += "\\b"; break;
            case '\f': out += "\\f"; break;
            case '\n': out += "\\n"; break;
            case '\r': out += "\\r"; break;
            case '\t': out += "\\t"; break;
            default: out += c; break;
        }
    }
    return out;
}

inline void WriteNode(std::ostream& stream, const ptree& node,
                      const int indent)
{
    const std::string pad(static_cast<std::size_t>(indent) * 4, ' ');
    const std::string childPad(static_cast<std::size_t>(indent + 1) * 4, ' ');

    if (node.empty()) {
        /* Scalar: boost's write_json emits every scalar as a string */
        stream << '"' << EscapeJson(node.data()) << '"';
        return;
    }

    /* Array iff every child key is empty (boost mapping) */
    bool isArray = true;
    for (const auto& [key, child] : node)
        if (!key.empty()) { isArray = false; break; }

    stream << (isArray ? '[' : '{') << '\n';
    bool first = true;
    for (const auto& [key, child] : node) {
        if (!first)
            stream << ",\n";
        first = false;
        stream << childPad;
        if (!isArray)
            stream << '"' << EscapeJson(key) << "\": ";
        WriteNode(stream, child, indent + 1);
    }
    stream << '\n' << pad << (isArray ? ']' : '}');
}

} /* namespace json_detail */

inline void read_json(std::istream& stream, ptree& tree)
{
    const std::string text {
        std::istreambuf_iterator<char>(stream),
        std::istreambuf_iterator<char>() };
    json_detail::Parser parser { text };
    parser.Parse(tree);
}

template <typename Path>
inline void read_json(const Path& fileName, ptree& tree)
{
    std::ifstream file { fileName };
    if (!file)
        throw json_parser_error("Failed to open file");
    read_json(static_cast<std::istream&>(file), tree);
}

inline void write_json(std::ostream& stream, const ptree& tree)
{
    json_detail::WriteNode(stream, tree, 0);
    stream << '\n';
}

inline void write_json(const std::string& fileName, const ptree& tree)
{
    std::ofstream file { fileName };
    if (!file)
        throw json_parser_error("Failed to open file: " + fileName);
    write_json(file, tree);
}

} /* namespace property_tree */
} /* namespace boost */

#endif
