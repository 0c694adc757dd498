/* Minimal boost/version.hpp stand-in so the reference implementation can be
 * compiled for head-to-head validation without a system Boost install.
 * Version chosen > 1.67 so map_saver.cpp takes the gil::write_view branch. */
#ifndef SHIM_BOOST_VERSION_HPP
#define SHIM_BOOST_VERSION_HPP
#define BOOST_VERSION 107400
#define BOOST_LIB_VERSION "1_74"
#endif
