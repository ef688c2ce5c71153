SELECT CAST(vec_id AS BIGINT) AS vec_id, CAST(score AS DOUBLE) AS score FROM (VALUES
  (0, 1.0),
  (17, 0.334456),
  (12, 0.311027),
  (483, 0.300451),
  (260, 0.298669),
  (73, 0.297238),
  (212, 0.281399),
  (402, 0.2745),
  (299, 0.268713),
  (232, 0.267338)
) AS golden(vec_id, score)
