#ifndef SHIM_BOOST_GIL_GIL_ALL_HPP
#define SHIM_BOOST_GIL_GIL_ALL_HPP
#include <boost/gil.hpp>
#endif
