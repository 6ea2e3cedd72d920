"""Source layer: batch parquet readers + Kafka / Kafka-emulating sources."""
