/* Minimal gil PNG writer backed by libpng (write_view + png_tag), enough for
 * the reference MapSaver's BOOST_VERSION > 106700 branch. */
#ifndef SHIM_BOOST_GIL_EXTENSION_IO_PNG_HPP
#define SHIM_BOOST_GIL_EXTENSION_IO_PNG_HPP

#include <cstdio>
#include <ios>
#include <stdexcept>
#include <string>
#include <vector>

#include <png.h>

#include <boost/gil.hpp>

namespace boost {
namespace gil {

struct png_tag { };

inline void write_view(const std::string& fileName,
                       const rgb8_view_t& srcView,
                       const png_tag&)
{
    std::FILE* file = std::fopen(fileName.c_str(), "wb");
    if (file == nullptr)
        throw std::ios_base::failure("Failed to open " + fileName);

    png_structp pngPtr = png_create_write_struct(
        PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
    png_infop infoPtr = png_create_info_struct(pngPtr);

    if (setjmp(png_jmpbuf(pngPtr))) {
        png_destroy_write_struct(&pngPtr, &infoPtr);
        std::fclose(file);
        throw std::ios_base::failure("libpng write failed: " + fileName);
    }

    png_init_io(pngPtr, file);
    png_set_IHDR(pngPtr, infoPtr,
                 static_cast<png_uint_32>(srcView.width()),
                 static_cast<png_uint_32>(srcView.height()),
                 8, PNG_COLOR_TYPE_RGB, PNG_INTERLACE_NONE,
                 PNG_COMPRESSION_TYPE_DEFAULT, PNG_FILTER_TYPE_DEFAULT);
    png_write_info(pngPtr, infoPtr);

    /* rgb8_pixel_t is a packed 3-byte struct; each view row is contiguous */
    for (std::ptrdiff_t y = 0; y < srcView.height(); ++y)
        png_write_row(pngPtr, reinterpret_cast<png_const_bytep>(
            srcView.row(y)));

    png_write_end(pngPtr, infoPtr);
    png_destroy_write_struct(&pngPtr, &infoPtr);
    std::fclose(file);
}

} /* namespace gil */
} /* namespace boost */

#endif
