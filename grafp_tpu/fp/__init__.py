from grafp_tpu.fp.builder import FingerprintPipeline, create_dummy_db, create_fp_db, create_db
