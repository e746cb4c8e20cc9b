from e4s_tpu.models.facevid2vid.driver import build_reenactor, drive_source
