from e4s_tpu.models.gpen.face_enhancement import build_restorer
