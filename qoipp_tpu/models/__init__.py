"""qoipp_tpu.models"""
