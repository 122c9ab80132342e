# CMake package-config for the mini-nifti test shim, so the reference's
# `find_package(NIFTI QUIET)` (imutil/CMakeLists.txt:82) resolves and its
# CLIs build with NIFTI support on this nifticlib-less host.  Point
# -DNIFTI_DIR at the *build* directory that tests/oracle lays out as
#   <dir>/NIFTIConfig.cmake  (copied from here)
#   <dir>/include/nifti1_io.h
#   <dir>/lib/libniftiio.so
get_filename_component(_mini_nifti_dir "${CMAKE_CURRENT_LIST_FILE}" DIRECTORY)
set(NIFTI_INCLUDE_DIRS "${_mini_nifti_dir}/include")
set(NIFTI_LIBRARIES "${_mini_nifti_dir}/lib/libniftiio.so")
set(NIFTI_FOUND TRUE)
