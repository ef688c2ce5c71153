SELECT CAST(vec_id AS BIGINT) AS vec_id, CAST(score AS DOUBLE) AS score FROM (VALUES
  (0, 1.0),
  (365, 0.369994),
  (334, 0.362722),
  (423, 0.296934),
  (320, 0.287861),
  (190, 0.281795),
  (388, 0.276301),
  (483, 0.2567),
  (323, 0.256455),
  (344, 0.252487)
) AS golden(vec_id, score)
