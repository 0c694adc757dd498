/* Minimal boost::gil stand-in (rgb8 only) so the reference implementation's
 * MapSaver compiles and produces PNGs without Boost.GIL. Provides:
 * rgb8_pixel_t, rgb8_image_t, rgb8_view_t (shallow-const, signed stride),
 * view(), fill_pixels(), subimage_view(), flipped_up_down_view().
 * The PNG writer lives in boost/gil/extension/io/png.hpp (libpng-backed).
 */
#ifndef SHIM_BOOST_GIL_HPP
#define SHIM_BOOST_GIL_HPP

#include <cstddef>
#include <cstdint>
#include <vector>

namespace boost {
namespace gil {

struct rgb8_pixel_t
{
    std::uint8_t r = 0;
    std::uint8_t g = 0;
    std::uint8_t b = 0;

    rgb8_pixel_t() = default;
    rgb8_pixel_t(const std::uint8_t red, const std::uint8_t green,
                 const std::uint8_t blue) : r(red), g(green), b(blue) { }
};

/* Shallow-const view: operator() on a const view still yields a mutable
 * pixel reference, matching GIL's semantics. Negative row stride encodes
 * the flipped view. */
class rgb8_view_t
{
public:
    rgb8_view_t() = default;
    rgb8_view_t(rgb8_pixel_t* base, const std::ptrdiff_t width,
                const std::ptrdiff_t height, const std::ptrdiff_t rowStride) :
        mBase(base), mWidth(width), mHeight(height), mRowStride(rowStride) { }

    std::ptrdiff_t width() const { return this->mWidth; }
    std::ptrdiff_t height() const { return this->mHeight; }

    rgb8_pixel_t& operator()(const std::ptrdiff_t x,
                             const std::ptrdiff_t y) const
    {
        return this->mBase[y * this->mRowStride + x];
    }

    rgb8_pixel_t* row(const std::ptrdiff_t y) const
    {
        return this->mBase + y * this->mRowStride;
    }

private:
    rgb8_pixel_t* mBase = nullptr;
    std::ptrdiff_t mWidth = 0;
    std::ptrdiff_t mHeight = 0;
    std::ptrdiff_t mRowStride = 0;
};

class rgb8_image_t
{
public:
    rgb8_image_t(const std::ptrdiff_t width, const std::ptrdiff_t height) :
        mWidth(width), mHeight(height),
        mPixels(static_cast<std::size_t>(width * height)) { }

    std::ptrdiff_t width() const { return this->mWidth; }
    std::ptrdiff_t height() const { return this->mHeight; }
    rgb8_pixel_t* data() { return this->mPixels.data(); }

private:
    std::ptrdiff_t mWidth;
    std::ptrdiff_t mHeight;
    std::vector<rgb8_pixel_t> mPixels;

    friend rgb8_view_t view(rgb8_image_t&);
};

inline rgb8_view_t view(rgb8_image_t& image)
{
    return rgb8_view_t { image.data(), image.width(), image.height(),
                         image.width() };
}

inline void fill_pixels(const rgb8_view_t& dstView, const rgb8_pixel_t& pixel)
{
    for (std::ptrdiff_t y = 0; y < dstView.height(); ++y)
        for (std::ptrdiff_t x = 0; x < dstView.width(); ++x)
            dstView(x, y) = pixel;
}

inline rgb8_view_t subimage_view(const rgb8_view_t& srcView,
                                 const std::ptrdiff_t x,
                                 const std::ptrdiff_t y,
                                 const std::ptrdiff_t width,
                                 const std::ptrdiff_t height)
{
    return rgb8_view_t { &srcView(x, y), width, height,
                         /* same physical stride as the parent view */
                         &srcView(0, 1) - &srcView(0, 0) };
}

inline rgb8_view_t flipped_up_down_view(const rgb8_view_t& srcView)
{
    const std::ptrdiff_t stride = &srcView(0, 1) - &srcView(0, 0);
    return rgb8_view_t { &srcView(0, srcView.height() - 1),
                         srcView.width(), srcView.height(), -stride };
}

} /* namespace gil */
} /* namespace boost */

#endif
