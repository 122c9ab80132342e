/* Test oracle: thin C shim over the reference SIFT3D libraries.
 *
 * This file is test scaffolding for the TPU reimplementation. It links
 * against the *reference* libraries (built separately from /root/reference)
 * and exposes flat-array entry points for ctypes, so the Python test suite
 * can compare the TPU implementation against the reference bit-for-bit.
 * It contains no reimplemented algorithm code.
 */

#include <stdlib.h>
#include <string.h>
#include "imtypes.h"
#include "immacros.h"
#include "imutil.h"
#include "sift.h"
#include "reg.h"

static SIFT3D g_sift;
static Keypoint_store g_kp;
static int g_init = 0;

static void ensure_init(void) {
    if (!g_init) {
        init_SIFT3D(&g_sift);
        init_Keypoint_store(&g_kp);
        g_init = 1;
    }
}

static void fill_image(Image *im, const float *data, int nx, int ny, int nz,
                       double ux, double uy, double uz) {
    init_im(im);
    im->nx = nx; im->ny = ny; im->nz = nz; im->nc = 1;
    im->ux = ux; im->uy = uy; im->uz = uz;
    im_default_stride(im);
    im_resize(im);
    /* data is (z, y, x) C-order = x-fastest, matching the reference layout */
    memcpy(im->data, data, (size_t)nx * ny * nz * sizeof(float));
}

/* Run detect_keypoints. Returns keypoint count or -1.
 * out rows: [x y z o s R00..R22], 14 doubles each (octave coordinates). */
int orc_detect(const float *data, int nx, int ny, int nz,
               double ux, double uy, double uz,
               double peak_thresh, double corner_thresh,
               double *out, int cap) {
    Image im;
    int i;
    ensure_init();
    set_peak_thresh_SIFT3D(&g_sift, peak_thresh);
    set_corner_thresh_SIFT3D(&g_sift, corner_thresh);
    fill_image(&im, data, nx, ny, nz, ux, uy, uz);
    if (SIFT3D_detect_keypoints(&g_sift, &im, &g_kp)) { im_free(&im); return -1; }
    im_free(&im);
    for (i = 0; i < g_kp.slab.num && i < cap; i++) {
        const Keypoint *k = g_kp.buf + i;
        double *row = out + 14 * i;
        int r, c;
        row[0] = k->xd; row[1] = k->yd; row[2] = k->zd;
        row[3] = (double)k->o; row[4] = k->sd;
        for (r = 0; r < 3; r++)
            for (c = 0; c < 3; c++)
                row[5 + 3 * r + c] =
                    (double)SIFT3D_MAT_RM_GET(&k->R, r, c, float);
    }
    return g_kp.slab.num;
}

/* After orc_detect: dims of gpyr level (o,s) -> dims3 = {nx, ny, nz}. */
int orc_gpyr_dims(int o, int s, int *dims3) {
    Image *lvl;
    ensure_init();
    if (o < g_sift.gpyr.first_octave ||
        o > SIFT3D_PYR_LAST_OCTAVE(&g_sift.gpyr) ||
        s < g_sift.gpyr.first_level ||
        s > SIFT3D_PYR_LAST_LEVEL(&g_sift.gpyr)) return -1;
    lvl = SIFT3D_PYR_IM_GET(&g_sift.gpyr, o, s);
    dims3[0] = lvl->nx; dims3[1] = lvl->ny; dims3[2] = lvl->nz;
    return 0;
}

int orc_get_gpyr(int o, int s, float *out) {
    Image *lvl;
    int x, y, z;
    ensure_init();
    lvl = SIFT3D_PYR_IM_GET(&g_sift.gpyr, o, s);
    SIFT3D_IM_LOOP_START(lvl, x, y, z)
        out[x + lvl->nx * (y + lvl->ny * z)] =
            SIFT3D_IM_GET_VOX(lvl, x, y, z, 0);
    SIFT3D_IM_LOOP_END
    return lvl->nx * lvl->ny * lvl->nz;
}

int orc_get_dog(int o, int s, float *out) {
    Image *lvl;
    int x, y, z;
    ensure_init();
    lvl = SIFT3D_PYR_IM_GET(&g_sift.dog, o, s);
    SIFT3D_IM_LOOP_START(lvl, x, y, z)
        out[x + lvl->nx * (y + lvl->ny * z)] =
            SIFT3D_IM_GET_VOX(lvl, x, y, z, 0);
    SIFT3D_IM_LOOP_END
    return lvl->nx * lvl->ny * lvl->nz;
}

int orc_num_octaves(void) {
    ensure_init();
    return g_sift.gpyr.num_octaves;
}

/* After orc_detect: extract descriptors. out rows: [x y z sd el0..el767],
 * 772 doubles each. Returns count or -1. */
int orc_extract(double *out, int cap) {
    SIFT3D_Descriptor_store desc;
    int i, j;
    ensure_init();
    init_SIFT3D_Descriptor_store(&desc);
    if (SIFT3D_extract_descriptors(&g_sift, &g_kp, &desc)) return -1;
    for (i = 0; i < desc.num && i < cap; i++) {
        const SIFT3D_Descriptor *d = desc.buf + i;
        double *row = out + 772 * i;
        row[0] = d->xd; row[1] = d->yd; row[2] = d->zd; row[3] = d->sd;
        for (j = 0; j < DESC_NUM_TOTAL_HIST; j++) {
            int b;
            for (b = 0; b < HIST_NUMEL; b++)
                row[4 + j * HIST_NUMEL + b] = (double)d->hists[j].bins[b];
        }
    }
    i = desc.num;
    cleanup_SIFT3D_Descriptor_store(&desc);
    return i;
}

/* Raw-image descriptor extraction (SIFT3D_extract_raw_descriptors).
 * kp_rows: n x 15 doubles [x y z o s sd R00..R22] (octave coordinates).
 * out rows: [x y z sd el0..el767], 772 doubles. Returns count or -1. */
int orc_extract_raw(const float *data, int nx, int ny, int nz,
                    double ux, double uy, double uz,
                    const double *kp_rows, int n_kp, double *out, int cap) {
    Image im;
    Keypoint_store kps;
    SIFT3D_Descriptor_store desc;
    int i, j, ret = -1;
    ensure_init();
    fill_image(&im, data, nx, ny, nz, ux, uy, uz);
    init_Keypoint_store(&kps);
    init_SIFT3D_Descriptor_store(&desc);
    if (resize_Keypoint_store(&kps, n_kp)) goto quit;
    for (i = 0; i < n_kp; i++) {
        Keypoint *k = kps.buf + i;
        const double *row = kp_rows + 15 * i;
        int r, c;
        if (init_Keypoint(k)) goto quit;
        k->xd = row[0]; k->yd = row[1]; k->zd = row[2];
        k->o = (int)row[3]; k->s = (int)row[4]; k->sd = row[5];
        for (r = 0; r < 3; r++)
            for (c = 0; c < 3; c++)
                SIFT3D_MAT_RM_GET(&k->R, r, c, float) =
                    (float)row[6 + 3 * r + c];
    }
    if (SIFT3D_extract_raw_descriptors(&g_sift, &im, &kps, &desc)) goto quit;
    for (i = 0; i < desc.num && i < cap; i++) {
        const SIFT3D_Descriptor *d = desc.buf + i;
        double *row = out + 772 * i;
        row[0] = d->xd; row[1] = d->yd; row[2] = d->zd; row[3] = d->sd;
        for (j = 0; j < DESC_NUM_TOTAL_HIST; j++) {
            int b;
            for (b = 0; b < HIST_NUMEL; b++)
                row[4 + j * HIST_NUMEL + b] = (double)d->hists[j].bins[b];
        }
    }
    ret = desc.num;
quit:
    im_free(&im);
    cleanup_Keypoint_store(&kps);
    cleanup_SIFT3D_Descriptor_store(&desc);
    return ret;
}

/* Gaussian blur via apply_Sep_FIR_filter (unit spacing `unit`). */
int orc_gauss_blur(const float *data, int nx, int ny, int nz,
                   double ux, double uy, double uz,
                   double sigma, double unit, float *out) {
    Image im, dst;
    Gauss_filter g;
    int x, y, z;
    fill_image(&im, data, nx, ny, nz, ux, uy, uz);
    init_im(&dst);
    if (init_Gauss_filter(&g, sigma, 3)) return -1;
    if (apply_Sep_FIR_filter(&im, &dst, &g.f, unit)) return -1;
    SIFT3D_IM_LOOP_START(&dst, x, y, z)
        out[x + dst.nx * (y + dst.ny * z)] =
            SIFT3D_IM_GET_VOX(&dst, x, y, z, 0);
    SIFT3D_IM_LOOP_END
    im_free(&im); im_free(&dst); cleanup_Gauss_filter(&g);
    return nx * ny * nz;
}

/* Toggle rotation-invariant dense descriptors (dense_rotate). */
void orc_set_dense_rotate(int flag) {
    ensure_init();
    g_sift.dense_rotate = flag;
}

/* Dense descriptors: returns 12-channel image as out[b][z][y][x] (b-major).
 * Returns 0 or -1. */
int orc_dense(const float *data, int nx, int ny, int nz,
              double ux, double uy, double uz, float *out) {
    Image im, desc;
    int x, y, z, c;
    ensure_init();
    fill_image(&im, data, nx, ny, nz, ux, uy, uz);
    init_im(&desc);
    if (SIFT3D_extract_dense_descriptors(&g_sift, &im, &desc)) {
        im_free(&im);
        return -1;
    }
    for (c = 0; c < desc.nc; c++)
        SIFT3D_IM_LOOP_START(&desc, x, y, z)
            out[x + desc.nx * (y + desc.ny * (z + desc.nz * c))] =
                SIFT3D_IM_GET_VOX(&desc, x, y, z, c);
        SIFT3D_IM_LOOP_END
    im_free(&im); im_free(&desc);
    return 0;
}

/* Pull-warp src through affine A (3x4 row-major), output same dims.
 * interp: 0 = linear, 1 = lanczos2. Returns 0 or -1. */
int orc_inv_transform(const float *data, int nx, int ny, int nz,
                      const double *A_in, int interp, float *out) {
    Image im, dst;
    Affine aff;
    Mat_rm A;
    int x, y, z, i, j, ret = -1;
    fill_image(&im, data, nx, ny, nz, 1.0, 1.0, 1.0);
    init_im(&dst);
    if (init_Mat_rm(&A, 3, 4, SIFT3D_DOUBLE, SIFT3D_TRUE)) return -1;
    for (i = 0; i < 3; i++)
        for (j = 0; j < 4; j++)
            SIFT3D_MAT_RM_GET(&A, i, j, double) = A_in[4 * i + j];
    if (init_Affine(&aff, 3) || Affine_set_mat(&A, &aff)) goto quit;
    if (im_inv_transform(&aff, &im, interp ? LANCZOS2 : LINEAR,
                         SIFT3D_TRUE, &dst)) goto quit;
    SIFT3D_IM_LOOP_START(&dst, x, y, z)
        out[x + dst.nx * (y + dst.ny * z)] =
            SIFT3D_IM_GET_VOX(&dst, x, y, z, 0);
    SIFT3D_IM_LOOP_END
    ret = 0;
quit:
    im_free(&im); im_free(&dst); cleanup_Mat_rm(&A);
    return ret;
}

/* Match two descriptor matrices (n x 771 float rows: [x y z el0..el767]).
 * matches_out has n1 ints. Returns 0 or -1. */
int orc_match(const float *d1, int n1, const float *d2, int n2,
              double nn_thresh, int *matches_out) {
    Mat_rm m1, m2;
    SIFT3D_Descriptor_store s1, s2;
    int *matches = NULL;
    int i, ret = -1;
    init_Mat_rm(&m1, n1, 771, SIFT3D_FLOAT, SIFT3D_FALSE);
    init_Mat_rm(&m2, n2, 771, SIFT3D_FLOAT, SIFT3D_FALSE);
    memcpy(m1.u.data_float, d1, (size_t)n1 * 771 * sizeof(float));
    memcpy(m2.u.data_float, d2, (size_t)n2 * 771 * sizeof(float));
    init_SIFT3D_Descriptor_store(&s1);
    init_SIFT3D_Descriptor_store(&s2);
    if (Mat_rm_to_SIFT3D_Descriptor_store(&m1, &s1) ||
        Mat_rm_to_SIFT3D_Descriptor_store(&m2, &s2))
        goto quit;
    if (SIFT3D_nn_match(&s1, &s2, (float)nn_thresh, &matches))
        goto quit;
    for (i = 0; i < n1; i++) matches_out[i] = matches[i];
    ret = 0;
quit:
    free(matches);
    cleanup_Mat_rm(&m1); cleanup_Mat_rm(&m2);
    cleanup_SIFT3D_Descriptor_store(&s1);
    cleanup_SIFT3D_Descriptor_store(&s2);
    return ret;
}

/* RANSAC affine fit: src/ref are n x 3 double. A_out is 3x4 row-major.
 * Returns 0 or -1. */
int orc_ransac(const double *src, const double *ref, int n,
               double err_thresh, int num_iter, unsigned int seed,
               double *A_out) {
    Mat_rm msrc, mref;
    Ransac ran;
    Affine aff;
    int i, j, ret = -1;
    srand(seed);
    init_Mat_rm(&msrc, n, 3, SIFT3D_DOUBLE, SIFT3D_FALSE);
    init_Mat_rm(&mref, n, 3, SIFT3D_DOUBLE, SIFT3D_FALSE);
    memcpy(msrc.u.data_double, src, (size_t)n * 3 * sizeof(double));
    memcpy(mref.u.data_double, ref, (size_t)n * 3 * sizeof(double));
    init_Ransac(&ran);
    set_err_thresh_Ransac(&ran, err_thresh);
    set_num_iter_Ransac(&ran, num_iter);
    if (init_Affine(&aff, 3)) goto quit;
    if (find_tform_ransac(&ran, &msrc, &mref, &aff)) goto quit;
    for (i = 0; i < 3; i++)
        for (j = 0; j < 4; j++)
            A_out[4 * i + j] = SIFT3D_MAT_RM_GET(&aff.A, i, j, double);
    ret = 0;
quit:
    cleanup_Mat_rm(&msrc); cleanup_Mat_rm(&mref);
    return ret;
}
