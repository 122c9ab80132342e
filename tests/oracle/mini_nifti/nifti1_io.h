/* Minimal from-scratch nifti1_io API shim (TEST HARNESS ONLY).
 *
 * The build image has no nifticlib, so the reference (/root/reference)
 * compiles with NIFTI support disabled and its CLIs cannot read any
 * image format.  CLI-vs-CLI golden tests (the reference's own de-facto
 * golden methodology, wrappers/matlab/Sift3DTest.m:72-175,277-329) need
 * the real kpSift3D/regSift3D/denseSift3D binaries to read and write
 * .nii/.nii.gz, which requires exactly the nifticlib subset that
 * imutil/nifti.c calls (nifti_image_read, nifti_make_new_nim,
 * nifti_set_filenames, nifti_nim_is_valid, nifti_image_write,
 * nifti_datatype_string, nifti_free_extensions, nifti_image_free).
 *
 * This header + mini_nifti.c implement that subset from the NIFTI-1
 * standard (same header layout as sift3d_tpu/io/nifti.py).  It is NOT
 * part of the shipped framework - it only exists so the reference
 * binaries become runnable as golden oracles on this host.
 */

#ifndef MINI_NIFTI1_IO_H
#define MINI_NIFTI1_IO_H

#include <stddef.h>

#ifdef __cplusplus
extern "C" {
#endif

/* NIFTI-1 standard datatype codes (nifti1.h values). */
#define DT_UINT8        2
#define DT_INT16        4
#define DT_INT32        8
#define DT_FLOAT32     16
#define DT_COMPLEX64   32
#define DT_FLOAT64     64
#define DT_RGB24      128
#define DT_INT8       256
#define DT_UINT16     512
#define DT_UINT32     768
#define DT_INT64     1024
#define DT_UINT64    1280
#define DT_FLOAT128  1536
#define DT_COMPLEX128 1792
#define DT_COMPLEX256 2048

#define NIFTI_TYPE_UINT8       DT_UINT8
#define NIFTI_TYPE_INT16       DT_INT16
#define NIFTI_TYPE_INT32       DT_INT32
#define NIFTI_TYPE_FLOAT32     DT_FLOAT32
#define NIFTI_TYPE_COMPLEX64   DT_COMPLEX64
#define NIFTI_TYPE_FLOAT64     DT_FLOAT64
#define NIFTI_TYPE_RGB24       DT_RGB24
#define NIFTI_TYPE_INT8        DT_INT8
#define NIFTI_TYPE_UINT16      DT_UINT16
#define NIFTI_TYPE_UINT32      DT_UINT32
#define NIFTI_TYPE_INT64       DT_INT64
#define NIFTI_TYPE_UINT64      DT_UINT64
#define NIFTI_TYPE_FLOAT128    DT_FLOAT128
#define NIFTI_TYPE_COMPLEX128  DT_COMPLEX128
#define NIFTI_TYPE_COMPLEX256  DT_COMPLEX256

typedef struct nifti_image {
    int ndim;            /* dim[0] */
    int dim[8];          /* dim[0]=ndim, dim[1..7]=extents */
    int nx, ny, nz, nt, nu, nv, nw;
    size_t nvox;
    int nbyper;          /* bytes per voxel */
    int datatype;        /* DT_* code */
    float dx, dy, dz, dt, du, dv, dw;
    float pixdim[8];
    float scl_slope;
    float scl_inter;
    void *data;
    char *fname;         /* header/file name */
    char *iname;         /* image name (same file for .nii) */
    int byteorder;       /* 1 = native */
} nifti_image;

nifti_image *nifti_image_read(const char *path, int read_data);
nifti_image *nifti_make_new_nim(const int dims[], int datatype,
                                int data_fill);
int nifti_set_filenames(nifti_image *nim, const char *prefix,
                        int check, int set_byte_order);
int nifti_nim_is_valid(nifti_image *nim, int complain);
void nifti_image_write(nifti_image *nim);
void nifti_image_free(nifti_image *nim);
void nifti_free_extensions(nifti_image *nim);
const char *nifti_datatype_string(int dt_code);

#ifdef __cplusplus
}
#endif

#endif /* MINI_NIFTI1_IO_H */
