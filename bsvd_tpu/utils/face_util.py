"""Face restoration helper: detect -> align -> restore -> paste back
(reference: BasicSR/basicsr/utils/face_util.py:1-192).

dlib (detector + landmark predictors) is an optional external dependency,
guarded exactly like the reference; everything else — the similarity
transform (a closed-form Umeyama fit, replacing the reference's
skimage.transform.SimilarityTransform since skimage is not in this image),
warping, and the soft-mask paste-back — is numpy/cv2 and fully testable
without dlib.
"""

import os

import cv2
import numpy as np

from bsvd_tpu.utils.img_util import imwrite

try:
    import dlib
except ImportError:
    dlib = None


def umeyama_similarity(src, dst):
    """Least-squares similarity transform (rotation + uniform scale +
    translation) mapping src -> dst; returns a 2x3 affine matrix.

    Closed-form Umeyama (1991) — the same estimator behind
    skimage SimilarityTransform.estimate, which the reference uses
    (face_util.py:126-129).
    """
    src = np.asarray(src, np.float64)
    dst = np.asarray(dst, np.float64)
    n, d = src.shape
    src_mean = src.mean(axis=0)
    dst_mean = dst.mean(axis=0)
    src_c = src - src_mean
    dst_c = dst - dst_mean
    cov = dst_c.T @ src_c / n
    u, s, vt = np.linalg.svd(cov)
    sign = np.ones(d)
    if np.linalg.det(u) * np.linalg.det(vt) < 0:
        sign[-1] = -1
    rot = u @ np.diag(sign) @ vt
    var_src = (src_c ** 2).sum() / n
    scale = (s * sign).sum() / var_src
    t = dst_mean - scale * rot @ src_mean
    m = np.zeros((2, 3))
    m[:, :2] = scale * rot
    m[:, 2] = t
    return m


class FaceRestorationHelper:
    """Helper for the face restoration pipeline (reference
    face_util.py:15-192; same method surface and artifact layout)."""

    def __init__(self, upscale_factor, face_size=512):
        self.upscale_factor = upscale_factor
        self.face_size = (face_size, face_size)

        # standard 5 landmarks for FFHQ faces at 1024x1024
        # (reference face_util.py:22-27)
        self.face_template = np.array(
            [[686.77227723, 488.62376238], [586.77227723, 493.59405941],
             [337.91089109, 488.38613861], [437.95049505, 493.51485149],
             [513.58415842, 678.5049505]])
        self.face_template = self.face_template / (1024 // face_size)

        self.all_landmarks_5 = []
        self.all_landmarks_68 = []
        self.affine_matrices = []
        self.inverse_affine_matrices = []
        self.cropped_faces = []
        self.restored_faces = []
        self.save_png = True

    # ------------------------------------------------------- dlib-backed
    def init_dlib(self, detection_path, landmark5_path, landmark68_path):
        if dlib is None:
            raise ImportError('Please install dlib before testing face '
                              'restoration (reference face_util.py:9-12)')
        self.face_detector = dlib.cnn_face_detection_model_v1(detection_path)
        self.shape_predictor_5 = dlib.shape_predictor(landmark5_path)
        self.shape_predictor_68 = dlib.shape_predictor(landmark68_path)

    def free_dlib_gpu_memory(self):
        del self.face_detector
        del self.shape_predictor_5
        del self.shape_predictor_68

    def read_input_image(self, img_path):
        # (h, w, c) RGB, matching dlib.load_rgb_image
        img = cv2.imread(img_path, cv2.IMREAD_COLOR)
        self.input_img = img[:, :, ::-1].copy()

    def detect_faces(self, img_path, upsample_num_times=1,
                     only_keep_largest=False):
        self.read_input_image(img_path)
        det_faces = self.face_detector(self.input_img, upsample_num_times)
        if len(det_faces) == 0:
            print('No face detected. Try to increase upsample_num_times.')
        elif only_keep_largest:
            print('Detect several faces and only keep the largest.')
            areas = [(f.rect.right() - f.rect.left())
                     * (f.rect.bottom() - f.rect.top()) for f in det_faces]
            self.det_faces = [det_faces[int(np.argmax(areas))]]
        else:
            self.det_faces = det_faces
        return len(self.det_faces)

    def get_face_landmarks_5(self):
        for face in self.det_faces:
            shape = self.shape_predictor_5(self.input_img, face.rect)
            self.all_landmarks_5.append(
                np.array([[part.x, part.y] for part in shape.parts()]))
        return len(self.all_landmarks_5)

    def get_face_landmarks_68(self):
        """68 landmarks for each cropped face (one face expected)."""
        num_detected_face = 0
        for idx, face in enumerate(self.cropped_faces):
            det_face = self.face_detector(face, 1)
            if len(det_face) == 0:
                print(f'Cannot find faces in cropped image with index {idx}.')
                self.all_landmarks_68.append(None)
                continue
            if len(det_face) > 1:
                print('Detect several faces in the cropped face. Use the '
                      'largest one.')
                areas = [(f.rect.right() - f.rect.left())
                         * (f.rect.bottom() - f.rect.top())
                         for f in det_face]
                face_rect = det_face[int(np.argmax(areas))].rect
            else:
                face_rect = det_face[0].rect
            shape = self.shape_predictor_68(face, face_rect)
            self.all_landmarks_68.append(
                np.array([[part.x, part.y] for part in shape.parts()]))
            num_detected_face += 1
        return num_detected_face

    # --------------------------------------------------- pure numpy/cv2
    def warp_crop_faces(self, save_cropped_path=None,
                        save_inverse_affine_path=None):
        """Affine-align each face to the template; store the inverse
        transform for paste-back (reference face_util.py:121-155)."""
        for idx, landmark in enumerate(self.all_landmarks_5):
            affine_matrix = umeyama_similarity(landmark, self.face_template)
            self.affine_matrices.append(affine_matrix)
            cropped_face = cv2.warpAffine(self.input_img, affine_matrix,
                                          self.face_size)
            self.cropped_faces.append(cropped_face)
            if save_cropped_path is not None:
                path, ext = os.path.splitext(save_cropped_path)
                suffix = '.png' if self.save_png else ext
                imwrite(cv2.cvtColor(cropped_face, cv2.COLOR_RGB2BGR),
                        f'{path}_{idx:02d}{suffix}')

            inverse_affine = umeyama_similarity(
                self.face_template, landmark * self.upscale_factor)
            self.inverse_affine_matrices.append(inverse_affine)
            if save_inverse_affine_path is not None:
                path, _ = os.path.splitext(save_inverse_affine_path)
                np.save(f'{path}_{idx:02d}.npy', inverse_affine)

    def add_restored_face(self, face):
        self.restored_faces.append(face)

    def paste_faces_to_input_image(self, save_path):
        """Inverse-warp each restored face and blend with an eroded +
        Gaussian-feathered mask (reference face_util.py:160-186). BGR."""
        input_img = cv2.cvtColor(self.input_img, cv2.COLOR_RGB2BGR)
        h, w, _ = input_img.shape
        h_up, w_up = h * self.upscale_factor, w * self.upscale_factor
        upsample_img = cv2.resize(input_img, (w_up, h_up)).astype(np.float32)
        assert len(self.restored_faces) == len(self.inverse_affine_matrices), \
            'length of restored_faces and affine_matrices are different.'
        for restored_face, inverse_affine in zip(self.restored_faces,
                                                 self.inverse_affine_matrices):
            inv_restored = cv2.warpAffine(restored_face, inverse_affine,
                                          (w_up, h_up))
            mask = np.ones((*self.face_size, 3), dtype=np.float32)
            inv_mask = cv2.warpAffine(mask, inverse_affine, (w_up, h_up))
            # remove black borders introduced by the warp
            inv_mask_erosion = cv2.erode(
                inv_mask, np.ones((2 * self.upscale_factor,
                                   2 * self.upscale_factor), np.uint8))
            inv_restored_remove_border = inv_mask_erosion * inv_restored
            total_face_area = np.sum(inv_mask_erosion) // 3
            # fusion edge width scales with the face area
            w_edge = int(total_face_area ** 0.5) // 20
            erosion_radius = w_edge * 2
            inv_mask_center = cv2.erode(
                inv_mask_erosion,
                np.ones((erosion_radius, erosion_radius), np.uint8))
            blur_size = w_edge * 2
            inv_soft_mask = cv2.GaussianBlur(inv_mask_center,
                                             (blur_size + 1, blur_size + 1), 0)
            upsample_img = (inv_soft_mask * inv_restored_remove_border
                            + (1 - inv_soft_mask) * upsample_img)
        if self.save_png:
            save_path = save_path.replace('.jpg', '.png').replace(
                '.jpeg', '.png')
        imwrite(upsample_img.astype(np.uint8), save_path)
        return upsample_img

    def clean_all(self):
        self.all_landmarks_5 = []
        self.all_landmarks_68 = []
        self.restored_faces = []
        self.affine_matrices = []
        self.cropped_faces = []
        self.inverse_affine_matrices = []
